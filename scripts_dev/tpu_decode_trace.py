"""Capture a device trace of the B=32 generate (bf16 and int4+W8A8
scan configs) and print a per-op accounting of the decode region.

Motivation (round 4): per-step decode time across bf16/int8/int4 weight
streams fits time/step ~= bytes/step / 510GB/s + ~2.3 ms FIXED — the
fixed term is ~75 ms/batch at 32 steps and dominates the int4 config.
This script answers what the fixed term IS (kernel launches? XLA glue
between kernels — KV-cache dynamic-update-slice, sampling, position
bookkeeping? sub-line-rate streaming?).

Usage: python scripts_dev/tpu_decode_trace.py [bf16|int4] [trace_dir]
Prints: total device time, top ops, and a category rollup
(pallas kernels / fusions / copies+DUS / other).
"""
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MODE = sys.argv[1] if len(sys.argv) > 1 else "int4"
TRACE_DIR = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/decode_trace_{MODE}"


def build():
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
    if MODE == "int4":
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
    np.asarray(jitted(params, vision_x, ids, mask))  # compile+warm
    w8a8.ENABLED = False
    return jitted, (params, vision_x, ids, mask)


def capture(jitted, args):
    with jax.profiler.trace(TRACE_DIR):
        np.asarray(jitted(*args))


def analyze():
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {TRACE_DIR}"
    path = max(paths, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    stats = defaultdict(float)
    counts = defaultdict(int)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = evmeta[ev.metadata_id].name
                stats[name] += ev.duration_ps / 1e6
                counts[name] += 1
    total = sum(stats.values())
    cats = defaultdict(float)
    for name, us in stats.items():
        ln = name.lower()
        if "custom-call" in ln or any(
            k in ln for k in ("fused_dense", "fused_mlp", "attend", "dense_stream",
                              "decode_layer", "tpu_custom_call", "vocab")
        ):
            cats["pallas_custom_call"] += us
        elif "dynamic-update-slice" in ln or "dynamic_update" in ln:
            cats["dynamic_update_slice"] += us
        elif ln.startswith("copy") or ".copy" in ln or "copy-start" in ln:
            cats["copy"] += us
        elif "fusion" in ln:
            cats["fusion"] += us
        elif "convolution" in ln or ln.startswith("dot") or "dot_general" in ln:
            cats["dot_conv"] += us
        else:
            cats["other"] += us
    print(f"== {MODE} B=32 generate device total: {total/1e3:.2f} ms")
    print("-- categories:")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e3:9.3f} ms  {k}")
    print("-- top 40 ops:")
    for name, us in sorted(stats.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {us:10.1f} us x{counts[name]:5d}  {name[:140]}")
    print(json.dumps({"mode": MODE, "device_total_ms": round(total / 1e3, 2),
                      "cats_ms": {k: round(v / 1e3, 3) for k, v in cats.items()}}))


if __name__ == "__main__":
    jitted, args = build()
    capture(jitted, args)
    analyze()
