"""On-TPU A/B: whole-layer single-launch kernel (ops/fused_layer) vs the
two-launch composition, on the production scan-int8 OF-3B generate.

Run: python scripts_dev/tpu_fused_layer_ab.py [B ...]   (default 32 8)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from open_flamingo_tpu.configs import flamingo_config
from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.ops import fused_layer
from open_flamingo_tpu.quantize import quantize_decode_params

T_TXT, NEW = 32, 32


def measure(m, cfg, B):
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    params = jax.jit(quantize_decode_params)(params)
    gen_cfg = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id
    )
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(m, p, vx, i, mk, gen_cfg)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    # steady-state: batches in flight, dispatch overlapped
    n_pipe = 5
    t0 = time.perf_counter()
    outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
    np.asarray(outs[-1])
    dt_pipe = (time.perf_counter() - t0) / n_pipe
    return B * NEW / dt, B * NEW / dt_pipe


def main():
    bs = [int(a) for a in sys.argv[1:]] or [32, 8]
    cfg = dataclasses.replace(flamingo_config("OF-3B"), scan_layers=True)
    m = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    for B in bs:
        for disable in (True, False):
            fused_layer.DISABLE = disable
            tok, tok_pipe = measure(m, cfg, B)
            name = "two-launch " if disable else "fused-layer"
            print(
                f"B={B:3d} {name}: {tok:7.1f} tok/s "
                f"(steady {tok_pipe:7.1f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
