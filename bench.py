"""Benchmark harness (driver contract): prints ONE JSON line.

Measures the flagship decode path from BASELINE.json configs[0]:
OF-3B (ViT-L/14 + MPT-1B arch, xattn every layer), bf16, single-image
prompts, KV-cached greedy generate. Metric: generated tokens/sec/chip
(vision encode + prefill + 32 decode steps all included in the timing).

vs_baseline is null: the reference publishes no throughput numbers and
its CUDA stack cannot run here (BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: the driver re-runs this every round
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from open_flamingo_tpu.configs import flamingo_config
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo

    cfg = flamingo_config("OF-3B")
    model = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

    B, T_TXT, NEW = 8, 32, 32
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)

    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    # create zeros on device inside jit — no host->device weight transfer,
    # and params stay jit *arguments* (never captured constants).
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()

    gen_cfg = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id
    )

    jitted = jax.jit(
        lambda p, vx, i, m: flamingo_generate(model, p, vx, i, m, gen_cfg)
    )
    import numpy as np

    np.asarray(jitted(params, vision_x, ids, mask))  # compile + warmup

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        # force a full device->host sync; block_until_ready alone has been
        # observed to return early over the remote-device tunnel.
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    tokens_per_sec = B * NEW / dt

    print(
        json.dumps(
            {
                "metric": "of3b_generate_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": None,
                "detail": {
                    "batch": B,
                    "prompt_len": T_TXT,
                    "new_tokens": NEW,
                    "images": B,
                    "p50_per_image_latency_s": round(dt / B, 4),
                    "dtype": "bf16",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
