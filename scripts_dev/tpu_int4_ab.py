"""On-TPU A/B: int4 vs int8 weight-streaming decode (--int4_decode).

Two parts:
  1. Micro-probe: FIRST real-chip compile of a pallas kernel with a
     jnp.int4 weight ref (Mosaic lowering + packed HBM layout check) —
     interpret tests cannot catch lowering errors (CLAUDE.md).
  2. Full A/B on the production config (scan engine, bf16 prefill —
     W8A8 is int8-only): int8 vs int4 decode tokens/s, plus HBM bytes
     of the side-car to confirm the packed layout.

Zeros weights: throughput is value-independent.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from open_flamingo_tpu.configs import flamingo_config
from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.ops.dense_stream import fused_dense, reference_dense
from open_flamingo_tpu.quantize import quantize_decode_params

# ---- part 1: micro-probe ---------------------------------------------------
# S4 arrays cannot cross the axon jit boundary (RecursionError in the
# transfer path — found round 3), so the int4 cast happens IN-GRAPH:
# int8 crosses the boundary, `astype(jnp.int4)` runs inside the jit.
print("probe: pallas int4 ref on", jax.devices()[0])
rng = np.random.default_rng(0)
K, N, B = 2048, 2048, 32
w_q = rng.integers(-7, 8, size=(K, N)).astype(np.float32)
s = 2.0 ** rng.integers(-8, -4, size=N).astype(np.float32)
x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
w8 = jnp.asarray(w_q, jnp.int8)
got = np.asarray(
    jax.jit(
        lambda w8, x: fused_dense(
            x, w8.astype(jnp.int4), w_scale=jnp.asarray(s),
            interpret=False,
        )
    )(w8, x)
).astype(np.float32)
want = np.asarray(
    reference_dense(x, jnp.asarray(w_q * s[None, :], jnp.bfloat16))
).astype(np.float32)
err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
print("probe ok: rel err", float(err))
assert err < 2e-2, err

# ---- part 2: full A/B ------------------------------------------------------
cfg = flamingo_config("OF-3B")
scan_model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
T_TXT = 32


def measure(B, bits, new=32):
    m = scan_model
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    params = jax.jit(
        lambda v: quantize_decode_params(v, bits=bits)
    )(params)
    gen_cfg = GenerationConfig(
        max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
    )
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(m, p, vx, i, mk, gen_cfg)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    n_pipe = 5
    t0 = time.perf_counter()
    outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
    np.asarray(outs[-1])
    dt_pipe = (time.perf_counter() - t0) / n_pipe
    return {
        "tok_s": round(B * new / dt, 1),
        "tok_s_steady": round(B * new / dt_pipe, 1),
        "dt": round(dt, 4),
    }


out = {}
for name, bits in (("int8", 8), ("int4", 4)):
    out[name] = {"b32": measure(32, bits), "b8": measure(8, bits)}
    print(name, json.dumps(out[name]))
