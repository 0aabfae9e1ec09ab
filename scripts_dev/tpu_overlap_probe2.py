"""Corrected overlap probe (round 4, v2): what does a DMA-bound weight
stream REALLY absorb?

v1 (tpu_overlap_probe.py) reported "34 GFLOP absorbed per launch at
absorption_cost ~= 0" — physically impossible: the 134 MB stream runs
~141 us at line rate, and 34 GFLOP needs >=173 us of MXU even at the
197 TFLOPs v5e peak. The artifact: 50-iteration timing loops (~8 ms
device) under a ~30-60 ms tunnel dispatch+sync, so the per-iteration
signal drowned in dispatch variance. v2 fixes the methodology:

  * 1000-iteration jitted fori loops (~140+ ms device per timing, so
    dispatch is <20% and identical across arms);
  * BOTH kernel outputs feed the loop carry (nothing is dead);
  * configs sized around the physical law being tested:
        t_kernel ~= max(DMA_bytes / line_rate, side_MXU_time) + fixed
    - side work below the per-step DMA window -> free (MXU idle);
    - side work above it -> the kernel goes MXU-bound, cost is real;
    - side ACTIVATION traffic (streamed side_x/side_out, the ViT-
      absorption regime) is added DMA and pays at line rate.

Stream: (2048, 32768) bf16 weight in (2048, 1024) blocks, 32 grid
steps, y = x @ Wblock — the decode-shaped DMA-bound baseline.

Side configs:
  res_s128/256/512 : resident (1024,1024) activation @ streamed
                     (1024, s) weight slice per step (v1's configs);
  vit_tile         : M-streamed (4096,1024) activation in (128,1024)
                     blocks @ resident (1024,512) weight, out streamed
                     — the shape class ViT absorption would use.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, K, N = 32, 2048, 32768
BLK_N = 1024
G = N // BLK_N                      # 32 grid steps
ITERS = 1000
LINE_GBS = 950.0
MXU_TFLOPS = 197.0                  # v5e bf16 peak


def kern_a(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def kern_res(x_ref, w_ref, sx_ref, sw_ref, o_ref, so_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)
    so_ref[...] = jnp.dot(
        sx_ref[...], sw_ref[...], preferred_element_type=jnp.float32
    ).astype(so_ref.dtype)


def call_a(x, w):
    return pl.pallas_call(
        kern_a,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((K, BLK_N), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, BLK_N), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(x, w)


def call_res(x, w, sx, sw, s_blk):
    return pl.pallas_call(
        kern_res,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((K, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
            pl.BlockSpec((1024, s_blk), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((B, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((1024, s_blk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N), x.dtype),
            jax.ShapeDtypeStruct((1024, sw.shape[1]), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(x, w, sx, sw)


SM, SM_BLK, SN = 4096, 128, 512


def call_vit_tile(x, w, sx, sw):
    """Side: M-streamed activation blocks against a RESIDENT weight —
    the ViT-absorption shape class (activations stream, weights sit)."""
    return pl.pallas_call(
        kern_res,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((K, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((SM_BLK, 1024), lambda i: (i, 0)),
            pl.BlockSpec((1024, SN), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((SM_BLK, SN), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N), x.dtype),
            jax.ShapeDtypeStruct((SM, SN), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(x, w, sx, sw)


def timed_loop(fn, args, n=ITERS):
    """Whole-jitted-loop; BOTH outputs feed the carry so neither can
    be dead. Per-iteration time from a ~>=140 ms device region."""

    def loop(x0, *rest):
        def body(_, x):
            out = fn(x, *rest)
            outs = out if isinstance(out, (tuple, list)) else (out,)
            acc = jnp.zeros((), jnp.float32)
            for o in outs:
                acc = acc + o[:1, :1].astype(jnp.float32).sum()
            return x + (acc * 0).astype(x.dtype)

        return jax.lax.fori_loop(0, n, body, x0)

    j = jax.jit(loop)
    np.asarray(j(*args))          # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(j(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[2] / n


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, K)), jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
sx_res = jnp.asarray(rng.normal(size=(1024, 1024)), jnp.bfloat16)

stream_bytes = K * N * 2
out = {"iters": ITERS, "stream_mb": round(stream_bytes / 2**20, 1)}
t_a = timed_loop(call_a, (x, w))
out["stream_alone_us"] = round(t_a * 1e6, 1)
print("A (stream alone):", out["stream_alone_us"], "us "
      f"({stream_bytes / t_a / 1e9:.0f} GB/s eff)", flush=True)


def record(label, t_b, side_gflop, added_dma_bytes):
    mxu_us = side_gflop * 1e3 / MXU_TFLOPS
    dma_us = added_dma_bytes / LINE_GBS / 1e3
    pred_us = max(dma_us, 0.0) + max(0.0, mxu_us - (t_a * 1e6))
    d = {
        "with_side_us": round(t_b * 1e6, 1),
        "delta_us": round((t_b - t_a) * 1e6, 1),
        "side_gflop": round(side_gflop, 2),
        "side_mxu_floor_us": round(mxu_us, 1),
        "added_dma_bytes_mb": round(added_dma_bytes / 2**20, 2),
        "added_dma_floor_us": round(dma_us, 1),
        "pred_delta_us": round(pred_us, 1),
    }
    out[label] = d
    print(label, json.dumps(d), flush=True)


for s_blk in (128, 256, 512):
    sw = jnp.asarray(
        rng.normal(size=(1024, G * s_blk)) * 0.02, jnp.bfloat16
    )
    t_b = timed_loop(
        functools.partial(call_res, s_blk=s_blk), (x, w, sx_res, sw)
    )
    record(
        f"res_s{s_blk}", t_b,
        2 * 1024 * 1024 * G * s_blk / 1e9,
        # streamed: sw in + so out (sx resident)
        (1024 * G * s_blk) * 2 * 2,
    )

sx_m = jnp.asarray(rng.normal(size=(SM, 1024)), jnp.bfloat16)
sw_r = jnp.asarray(rng.normal(size=(1024, SN)) * 0.02, jnp.bfloat16)
t_b = timed_loop(call_vit_tile, (x, w, sx_m, sw_r))
record(
    "vit_tile", t_b,
    2 * SM * 1024 * SN / 1e9,
    # streamed: sx blocks in + so out (sw resident)
    (SM * 1024 + SM * SN) * 2,
)

print(json.dumps(out))
