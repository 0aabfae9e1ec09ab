"""Prefill-absorption (VERDICT r4 #1 lever b) close-out probe (round 5).

The remaining absorption candidate after the ViT shipped is the decoder
prefill (42.6ms bf16 device, BASELINE decode anatomy). Two designs:

  (1) side-tile absorption (ViT recipe): prefill matmuls ride the decode
      launches' DMA windows as side tiles. Refuted by the measured
      overhead laws already in BASELINE: the ViT's ~50ms of side MXU
      cost 37.7ms of overhead bf16 (28% hiding efficiency) and broke
      even in every quantized regime; the prefill adds MORE glue per
      FLOP (causal attend, xattn, alibi, KV-cache writes) and its
      natural schedule (pipeline 3 deep: ViT of batch i+2 + prefill of
      batch i+1 inside decode of batch i) stacks onto windows the ViT
      already fills.

  (2) row-riding (chunked/teacher-forced prefill): batch i+1's prompt
      rows join the decode kernels as EXTRA rows — zero extra weight
      DMA, the prompt advances one token per decode step. This probe
      pins design (2)'s arithmetic with real step times:

        step32      = marginal decode-step cost, B=32, S<=64 (today)
        step64_s64  = marginal step cost, B=64, S<=64 (plain bigger
                      batch — the alternative that spends the same
                      memory on USEFUL rows)
        step64_s96  = marginal step cost, B=64, S<=96 (the pipelined
                      engine's shape: 32 decode rows at slots 32..96 +
                      32 prefill rows at slots 0..64)

      pipelined-64 throughput  = 32*32 / (32*step64_s96)   [no serial
                                 vision/prefill phases at all]
      plain-64 throughput      = 64*32 / T(B=64 generate)  [prefill +
                                 ViT serial, measured directly]

      If plain-64 >= pipelined-64, the design is DOMINATED at equal
      rows/memory by simply decoding more rows and keeping the batched
      prefill graph (which is MXU-efficient: ~42.6ms for 1024 prompt
      tokens vs 1 decode step *per token* when ridden).

      The fixed-row variant (prompt tokens teacher-forced through the
      SAME 32 rows between batches) loses by direct arithmetic: 32
      prompt tokens * step32 (~8.5ms) ≈ 270ms of decode-step time vs
      the 42.6ms prefill graph — no measurement needed.

Usage:
  python scripts_dev/tpu_prefill_absorb_probe.py            # driver
  python scripts_dev/tpu_prefill_absorb_probe.py --child <mode> <B> <T> <NEW>
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (label, B, prompt_T, new)
ARMS = [
    ("b32_s64_new32", 32, 32, 32),
    ("b32_s64_new1", 32, 32, 1),
    ("b64_s64_new32", 64, 32, 32),
    ("b64_s64_new1", 64, 32, 1),
    ("b64_s96_new32", 64, 64, 32),
    ("b64_s96_new1", 64, 64, 1),
]


def child(mode: str, B: int, T: int, NEW: int):
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
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T), jnp.int32)
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
    print(json.dumps({"batch_ms": round(dt * 1e3, 2)}))


def main():
    res = {}
    for mode in ("bf16", "int4"):
        for label, B, T, NEW in ARMS:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 mode, str(B), str(T), str(NEW)],
                capture_output=True, text=True, timeout=2400,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"{mode}/{label}: FAILED\n{r.stdout[-1500:]}\n"
                      f"{r.stderr[-1500:]}", flush=True)
                res[f"{mode}_{label}"] = None
                continue
            ms = json.loads(line[-1])["batch_ms"]
            res[f"{mode}_{label}"] = ms
            print(f"{mode}/{label}: {ms} ms/batch", flush=True)

    print()
    for mode in ("bf16", "int4"):
        g = lambda k: res.get(f"{mode}_{k}")
        if any(g(a[0]) is None for a in ARMS):
            print(f"{mode}: incomplete, skipping analysis")
            continue
        step32 = (g("b32_s64_new32") - g("b32_s64_new1")) / 31.0
        step64 = (g("b64_s64_new32") - g("b64_s64_new1")) / 31.0
        step64_96 = (g("b64_s96_new32") - g("b64_s96_new1")) / 31.0
        vp64 = g("b64_s64_new1") - step64  # serial vision+prefill, B=64
        pipelined = 32 * 32 / (32 * step64_96) * 1e3
        plain64 = 64 * 32 / g("b64_s64_new32") * 1e3
        serial32 = 32 * 32 / g("b32_s64_new32") * 1e3
        print(json.dumps({
            "mode": mode,
            "step32_ms": round(step32, 3),
            "step64_s64_ms": round(step64, 3),
            "step64_s96_ms": round(step64_96, 3),
            "vision_prefill_b64_ms": round(vp64, 1),
            "tok_s_serial_b32": round(serial32, 1),
            "tok_s_plain_b64": round(plain64, 1),
            "tok_s_pipelined64_UPPER_BOUND": round(pipelined, 1),
            "dominated": plain64 >= pipelined,
        }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], int(sys.argv[i + 2]),
              int(sys.argv[i + 3]), int(sys.argv[i + 4]))
    else:
        main()
