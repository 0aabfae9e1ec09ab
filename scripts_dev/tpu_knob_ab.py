"""Production A/B of the decode-kernel grid knobs (round 4).

tpu_decode_trace.py showed the decode loop is ~99% kernel time, with
each kernel's duration fitting t ~= fixed(10-20us) + pipeline terms on
top of bytes/line-rate. Block sizes trade per-block DMA-issue overhead
against fill exposure and VMEM; microbenchmarks are unreliable over the
tunnel (CLAUDE.md), so this drives the REAL B=32 generate per config in
a child process with env overrides (OFT_BLOCK_N / OFT_BLOCK_K2 /
OFT_HEAD_BLOCK, read at import by ops.dense_stream / ops.decode_layer).

Usage:
  python scripts_dev/tpu_knob_ab.py           # sweep driver
  python scripts_dev/tpu_knob_ab.py --child bf16|int4   # one measurement
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    # (label, env)
    ("base", {}),
    ("k2_4096", {"OFT_BLOCK_K2": "4096"}),
    ("k2_1024", {"OFT_BLOCK_K2": "1024"}),
    ("hb_16", {"OFT_HEAD_BLOCK": "16"}),
    ("hb_4", {"OFT_HEAD_BLOCK": "4"}),
    ("k2_4096_hb16", {"OFT_BLOCK_K2": "4096", "OFT_HEAD_BLOCK": "16"}),
]

# round-4 follow-up (sweep 1 found smaller blocks WIN — fill exposure,
# not per-block overhead, is the dominant term): combine the two
# winners and push block sizes further down
CONFIGS2 = [
    ("k2_1024_hb4", {"OFT_BLOCK_K2": "1024", "OFT_HEAD_BLOCK": "4"}),
    ("k2_512", {"OFT_BLOCK_K2": "512"}),
    ("k2_512_hb4", {"OFT_BLOCK_K2": "512", "OFT_HEAD_BLOCK": "4"}),
    ("k2_1024_hb4_bn512",
     {"OFT_BLOCK_K2": "1024", "OFT_HEAD_BLOCK": "4",
      "OFT_BLOCK_N": "512"}),
]


def child(mode: str):
    import time

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

    cfg = flamingo_config("OF-3B")
    model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    B, T_TXT, NEW = 32, 32, 32
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    if mode == "int4":
        from open_flamingo_tpu.quantize import quantize_prefill_params

        params = jax.jit(
            lambda v: quantize_prefill_params(v, bits=4)
        )(params)
        w8a8.ENABLED = True
    gen_cfg = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id
    )
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(model, p, vx, i, mk, gen_cfg)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    w8a8.ENABLED = False
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "mode": mode,
        "tok_s": round(B * NEW / dt, 1),
        "batch_ms": round(dt * 1e3, 1),
    }))


def main():
    configs = CONFIGS2 if "--followup" in sys.argv else CONFIGS
    results = {}
    for label, env in configs:
        for mode in ("bf16", "int4"):
            e = dict(os.environ, **env)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", mode],
                env=e, capture_output=True, text=True, timeout=1800,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"{label}/{mode}: FAILED\n{r.stdout[-2000:]}\n"
                      f"{r.stderr[-2000:]}", flush=True)
                results[f"{label}_{mode}"] = None
                continue
            d = json.loads(line[-1])
            results[f"{label}_{mode}"] = d["tok_s"]
            print(f"{label}/{mode}: {d['tok_s']} tok/s "
                  f"({d['batch_ms']} ms/batch)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
