"""On-TPU A/B: int8 KV + media caches (GenerationConfig.int8_kv) on the
production config (scan engine + int8 weights + W8A8 prefill).

First real-chip compile of the int8-cache kernel variants (interpret
tests cannot catch Mosaic lowering errors) + the perf delta.
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
from open_flamingo_tpu.quantize import quantize_prefill_params

cfg = flamingo_config("OF-3B")
scan_model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
T_TXT = 32


def measure(B, int8_kv, new=32):
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
    params = jax.jit(quantize_prefill_params)(params)
    w8a8.ENABLED = True
    gen_cfg = GenerationConfig(
        max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
        int8_kv=int8_kv,
    )
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
    }


out = {}
for name, kv8 in (("bf16_kv", False), ("int8_kv", True)):
    out[name] = {"b32": measure(32, kv8), "b8": measure(8, kv8)}
    print(name, json.dumps(out[name]))
