"""Gated-xattn tail merge A/B (VERDICT r4 #7): the xattn attention tail
streams ~10MB in 38us (~260GB/s — half the other kernels' efficiency;
BASELINE decode anatomy), i.e. it pays mostly per-launch fixed cost.
fused_layer.XATTN_ONLY folds it into the xattn ff launch (the round-3
whole-layer A/B only ever tested merging BOTH layer types; the decoder
merge is what lost).

Arms: OF-3B B=32, prompt 32, new 32, scan engine; bf16 and int4+W8A8;
XATTN_ONLY off/on. Serial + steady (5 in flight). Token equality is
asserted between off/on (same weights, zeros).
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
from open_flamingo_tpu.ops import fused_layer, w8a8
from open_flamingo_tpu.quantize import quantize_prefill_params

B, T_TXT, NEW = 32, 32, 32
cfg = flamingo_config("OF-3B")
model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
mask = jnp.ones((B, T_TXT), jnp.int32)
gen = GenerationConfig(
    max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id
)
shapes = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
)
params_bf16 = jax.jit(
    lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
)()

out = {}
for name, quant in (("bf16", False), ("int4w8a8", True)):
    if quant:
        params = jax.jit(
            lambda v: quantize_prefill_params(v, bits=4)
        )(params_bf16)
    else:
        params = params_bf16
    toks = {}
    for merged in (False, True):
        fused_layer.XATTN_ONLY = merged
        jitted = jax.jit(
            lambda p, vx, i, mk: flamingo_generate(model, p, vx, i, mk, gen)
        )
        if quant:
            w8a8.ENABLED = True
        t0 = time.perf_counter()
        toks[merged] = np.asarray(jitted(params, vision_x, ids, mask))
        w8a8.ENABLED = False
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            np.asarray(jitted(params, vision_x, ids, mask))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        n_pipe = 5
        t0 = time.perf_counter()
        outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
        np.asarray(outs[-1])
        dtp = (time.perf_counter() - t0) / n_pipe
        key = f"{name}_{'merged' if merged else 'two_launch'}"
        out[key] = {
            "tok_s": round(B * NEW / dt, 1),
            "tok_s_steady": round(B * NEW / dtp, 1),
            "ms": round(dt * 1e3, 1),
        }
        print(f"{key}: {out[key]} (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
        fused_layer.XATTN_ONLY = False
        del jitted
    assert (toks[False] == toks[True]).all(), "merge changed tokens"
    del params, toks
    import gc

    gc.collect()

print(json.dumps(out))
