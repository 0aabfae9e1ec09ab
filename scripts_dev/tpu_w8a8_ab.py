"""On-TPU A/B: W8A8 int8 prefill+vision (ops/w8a8.py) vs bf16 prefill,
both on the scan+int8-decode engine (the production config).

Reports full-generate tok/s at B=32/B=8 and the isolated
vision+prefill time (new=1 run minus one decode step).
"""
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

import dataclasses

from open_flamingo_tpu.configs import flamingo_config
from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.ops import w8a8
from open_flamingo_tpu.quantize import (
    quantize_decode_params,
    quantize_prefill_params,
)

cfg = flamingo_config("OF-3B")
scan_model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
T_TXT = 32


def measure(B, prefill_int8, new=32):
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
    qfn = quantize_prefill_params if prefill_int8 else quantize_decode_params
    params = jax.jit(qfn)(params)
    w8a8.ENABLED = prefill_int8
    gen_cfg = GenerationConfig(
        max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id
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
    w8a8.ENABLED = False
    return {
        "tok_s": round(B * new / dt, 1),
        "tok_s_steady": round(B * new / dt_pipe, 1),
        "dt": round(dt, 4),
    }


out = {}
for name, pf in (("bf16_prefill", False), ("w8a8_prefill", True)):
    out[name] = {
        "b32": measure(32, pf),
        "b8": measure(8, pf),
        "b32_new1": measure(32, pf, new=1),
    }
    print(name, json.dumps(out[name]))

for name in out:
    d32 = out[name]["b32"]["dt"]
    d1 = out[name]["b32_new1"]["dt"]
    step = (d32 - d1) / 31
    print(f"{name}: vision+prefill ~{(d1 - step)*1e3:.1f} ms/batch, "
          f"decode step ~{step*1e3:.2f} ms")
