"""Micro-probe: can DMA-bound weight streaming absorb unrelated MXU
work in the SAME kernel? (The feasibility gate for device-side
vision+prefill/decode cross-batch pipelining, VERDICT r3 #3.)

Kernel A: stream a (2048, 32768) bf16 weight in (2048, 1024) blocks,
compute y = x @ Wblock per grid step — pure decode-shaped DMA bound
(~134 MB -> ~140 us at the ~950 GB/s line rate).

Kernel B: same, PLUS a side matmul tile per grid step: a resident
(1024, 1024) activation against a (1024, s_block) slice of a second
weight — MXU work sized near the per-block DMA time. Mosaic pipelines
grid-step input DMAs against compute, so if the machine can overlap,
B's time stays ~= A's while doing the side FLOPs "for free".

Reports absorption = (t_B - t_A) / t_side_alone; ~0 means overlap
works, ~1 means the core serializes (refutation evidence).
Whole-jitted-fori-loop timings only (tunnel methodology, CLAUDE.md).
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
SM, SK = 1024, 1024                  # resident side activation
ITERS = 50


def kern_a(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def kern_b(x_ref, w_ref, sx_ref, sw_ref, o_ref, so_ref):
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


def call_b(x, w, sx, sw, s_blk):
    sg = sw.shape[1] // G
    assert sg == s_blk
    return pl.pallas_call(
        kern_b,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((K, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((SM, SK), lambda i: (0, 0)),
            pl.BlockSpec((SK, s_blk), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((B, BLK_N), lambda i: (0, i)),
            pl.BlockSpec((SM, s_blk), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N), x.dtype),
            jax.ShapeDtypeStruct((SM, sw.shape[1]), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
    )(x, w, sx, sw)


def timed_loop(fn, args, n=ITERS):
    """Whole-jitted-loop: carry x so iterations can't be CSE'd."""

    def loop(x0, *rest):
        def body(_, x):
            out = fn(x, *rest)
            o = out[0] if isinstance(out, (tuple, list)) else out
            return x + (o[:, :1].astype(jnp.float32).sum() * 0).astype(x.dtype)

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
sx = jnp.asarray(rng.normal(size=(SM, SK)), jnp.bfloat16)

out = {}
t_a = timed_loop(call_a, (x, w))
out["stream_alone_us"] = round(t_a * 1e6, 1)
print("A (stream alone):", out["stream_alone_us"], "us", flush=True)

for s_blk in (128, 256, 512):
    sw = jnp.asarray(
        rng.normal(size=(SK, G * s_blk)) * 0.02, jnp.bfloat16
    )
    t_b = timed_loop(
        functools.partial(call_b, s_blk=s_blk), (x, w, sx, sw)
    )
    # side matmul alone (XLA, same whole-loop method)
    t_s = timed_loop(lambda sx2, sw2: sx2 @ sw2, (sx, sw))
    side_gflop = 2 * SM * SK * G * s_blk / 1e9
    absorb = (t_b - t_a) / max(t_s, 1e-9)
    out[f"s{s_blk}"] = {
        "with_side_us": round(t_b * 1e6, 1),
        "side_alone_us": round(t_s * 1e6, 1),
        "side_gflop": round(side_gflop, 2),
        "absorption_cost": round(absorb, 3),
    }
    print(f"s_blk={s_blk}:", json.dumps(out[f"s{s_blk}"]), flush=True)

print(json.dumps(out))
