"""Sweep grid block sizes of the production decode kernels on TPU.

Round-4 trace finding (tpu_decode_trace.py): the three per-layer decode
kernels take ~96-100us each REGARDLESS of bytes streamed (LN+QKV 25MB,
attend 25MB, MLP 67MB) — i.e. time ~= n_grid_steps x ~6-16us overhead,
not bytes/950GB/s. If so, bigger blocks (fewer grid steps) should move
every kernel toward the DMA floor:
  QKV 25MB -> ~27us, MLP 67MB -> ~71us, attend 25MB -> ~27us.

Sweeps fused_dense block_n and fused_mlp block_k2 at the OF-3B decode
shapes (B=32, d=2048, QKV N=6144, MLP K2=8192), stacked L=24 layout
(the scan engine's), bf16 and int8. Whole-jitted-fori-loop timing.
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

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from open_flamingo_tpu.ops import dense_stream
from open_flamingo_tpu.ops.dense_stream import fused_dense, fused_mlp

B, D, L = 32, 2048, 24
N_QKV, K2 = 3 * D, 4 * D
ITERS = 100


def timed_loop(fn, x0, *ws, n=ITERS):
    """fn(x, *ws) — weights passed as jit ARGUMENTS (closing over them
    captures multi-MB constants -> HTTP 413 on the remote-compile
    tunnel, the CLAUDE.md landmine)."""

    def loop(x, *wargs):
        def body(_, xc):
            y = fn(xc, *wargs)
            return xc + (y[:, :1].astype(jnp.float32).sum() * 0).astype(xc.dtype)

        return jax.lax.fori_loop(0, n, body, x)

    j = jax.jit(loop)
    np.asarray(j(x0, *ws))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(j(x0, *ws))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[2] / n


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, D)), jnp.bfloat16)
li = jnp.asarray([L // 2], jnp.int32)

w_qkv = jnp.asarray(rng.normal(size=(L, D, N_QKV)) * 0.02, jnp.bfloat16)
w1 = jnp.asarray(rng.normal(size=(L, D, K2)) * 0.02, jnp.bfloat16)
w2 = jnp.asarray(rng.normal(size=(L, K2, D)) * 0.02, jnp.bfloat16)
ln_s = jnp.ones((L, D), jnp.bfloat16)

w_qkv_i8 = (w_qkv * 50).astype(jnp.int8)
w1_i8 = (w1 * 50).astype(jnp.int8)
w2_i8 = (w2 * 50).astype(jnp.int8)
s_qkv = jnp.ones((L, N_QKV), jnp.float32)
s1 = jnp.ones((L, K2), jnp.float32)
s2 = jnp.ones((L, D), jnp.float32)

out = {}

mb_qkv = D * N_QKV * 2 / 2**20
for bn in (512, 1024, 2048, 3072, 6144):
    t = timed_loop(
        lambda xc, w, ls, bn=bn: fused_dense(
            xc, w, ln_scale=ls, layer_idx=li, block_n=bn
        )[:, :D],
        x, w_qkv, ln_s,
    )
    out[f"qkv_bf16_bn{bn}"] = round(t * 1e6, 1)
    print(f"fused_dense bf16 {mb_qkv:.0f}MB block_n={bn}: {t*1e6:.1f} us "
          f"({mb_qkv/2**10/max(t,1e-9):.0f} GB/s)", flush=True)

mb_mlp = (D * K2 + K2 * D) * 2 / 2**20
for bk in (1024, 2048, 4096, 8192):
    t = timed_loop(
        lambda xc, wa, wb, ls, bk=bk: fused_mlp(
            xc, wa, wb, ln_scale=ls, residual=xc, layer_idx=li,
            block_k2=bk,
        ),
        x, w1, w2, ln_s,
    )
    out[f"mlp_bf16_bk{bk}"] = round(t * 1e6, 1)
    print(f"fused_mlp bf16 {mb_mlp:.0f}MB block_k2={bk}: {t*1e6:.1f} us "
          f"({mb_mlp/2**10/max(t,1e-9):.0f} GB/s)", flush=True)

for bn in (1024, 3072, 6144):
    t = timed_loop(
        lambda xc, w, sc, ls, bn=bn: fused_dense(
            xc, w, w_scale=sc, ln_scale=ls, layer_idx=li,
            block_n=bn,
        )[:, :D],
        x, w_qkv_i8, s_qkv, ln_s,
    )
    out[f"qkv_int8_bn{bn}"] = round(t * 1e6, 1)
    print(f"fused_dense int8 {mb_qkv/2:.0f}MB block_n={bn}: {t*1e6:.1f} us",
          flush=True)

for bk in (2048, 4096, 8192):
    t = timed_loop(
        lambda xc, wa, wb, sa, sb, ls, bk=bk: fused_mlp(
            xc, wa, wb, w1_scale=sa, w2_scale=sb, ln_scale=ls,
            residual=xc, layer_idx=li, block_k2=bk,
        ),
        x, w1_i8, w2_i8, s1, s2, ln_s,
    )
    out[f"mlp_int8_bk{bk}"] = round(t * 1e6, 1)
    print(f"fused_mlp int8 {mb_mlp/2:.0f}MB block_k2={bk}: {t*1e6:.1f} us",
          flush=True)

print(json.dumps(out))
