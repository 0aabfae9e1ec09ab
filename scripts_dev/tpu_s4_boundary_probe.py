"""Probe: can a jnp.int4 array cross a jit->jit boundary on the axon
backend when it never leaves the device? Round-3 found S4 fails the
TRANSFER path (RecursionError); if device-resident handoff works, the
serving engine can hoist activate_int4_stream out of _decode_chunk
(ADVICE r3 low: the int8->int4 cast re-runs per chunk)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

x8 = jnp.asarray(np.random.default_rng(0).integers(-7, 8, (256, 256)), jnp.int8)

try:
    q4 = jax.jit(lambda x: x.astype(jnp.int4))(x8)
    print("jit produced S4 output ok:", q4.dtype, q4.shape, flush=True)
    y = jax.jit(lambda q: (q.astype(jnp.float32) ** 2).sum())(q4)
    print("S4 consumed by second jit ok:", float(y), flush=True)
    # and inside a donated dict (the engine-state pattern)
    st = {"q": q4, "n": jnp.zeros((), jnp.int32)}
    st2 = jax.jit(
        lambda s: {"q": s["q"], "n": s["n"] + 1}, donate_argnums=(0,)
    )(st)
    z = jax.jit(lambda s: s["q"].astype(jnp.int8).sum())(st2)
    print("S4 through donated state dict ok:", int(z), flush=True)
    print("VERDICT: S4 jit->jit handoff WORKS on this backend")
except Exception as e:
    print("VERDICT: S4 jit->jit handoff FAILS:", repr(e)[:300])
