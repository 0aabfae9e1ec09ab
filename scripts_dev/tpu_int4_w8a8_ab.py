"""On-TPU A/B: int4 decode + W8A8 prefill (the composed stack) vs the
round-3 headline (int8 decode + W8A8 prefill).

Round-4 composition: activate_int4_stream now KEEPS the int8-stored
int4-grid copy alongside the S4 decode stream, and PDense's W8A8 path
consumes it (same dequant math), so --int4_decode + --int8_prefill is
one run. Zeros weights: throughput is value-independent.
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
from open_flamingo_tpu.ops import w8a8
from open_flamingo_tpu.quantize import quantize_prefill_params

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
        lambda v: quantize_prefill_params(v, bits=bits)
    )(params)
    gen_cfg = GenerationConfig(
        max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
    )
    w8a8.ENABLED = True
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(m, p, vx, i, mk, gen_cfg)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    w8a8.ENABLED = False
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
        "p50_img_ms": round(dt / B * 1e3, 2),
    }


out = {}
for name, bits in (("int8_w8a8", 8), ("int4_w8a8", 4)):
    out[name] = {"b32": measure(32, bits), "b8": measure(8, bits)}
    print(name, json.dumps(out[name]), flush=True)
