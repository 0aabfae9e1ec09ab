"""Sweep attn_block_decode's head_block (grid = H/head_block groups) at
the OF-3B decode shape: B=32, D=2048, H=16, Dh=128, S=64 cache, fused
QKV, stacked L=24 + group-stacked cache (the scan engine's layout).

Pipeline-fill model (tpu_decode_trace round 4): t ~= (1 + 1/N_steps) x
bytes/rate + fixed. 50MB at N=2 (head_block=8, today's default)
predicts ~79us + fixed; N=4 trades fill exposure for per-step cost.
Also sweeps the xattn-tail shape (media attend, no cache write).
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

from open_flamingo_tpu.ops.decode_layer import attn_block_decode

B, D, H, DH, S, L = 32, 2048, 16, 128, 64, 24
ITERS = 100


def timed_loop(fn, x0, *ws, n=ITERS):
    def loop(x, *wargs):
        def body(_, xc):
            y = fn(xc, *wargs)
            y = y[0] if isinstance(y, tuple) else y
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
ln_s = jnp.ones((L, D), jnp.bfloat16)
ln_b = jnp.zeros((L, D), jnp.bfloat16)
wqkv = jnp.asarray(rng.normal(size=(L, D, 3 * H * DH)) * 0.02, jnp.bfloat16)
wout = jnp.asarray(rng.normal(size=(L, H * DH, D)) * 0.02, jnp.bfloat16)
kc = jnp.zeros((L, B, H, S, DH), jnp.bfloat16)
vc = jnp.zeros((L, B, H, S, DH), jnp.bfloat16)
mask = jnp.ones((B, S), jnp.int32)
li = jnp.asarray(L // 2, jnp.int32)
slot = jnp.asarray(33 % S, jnp.int32)

mb = (D * 3 * H * DH + H * DH * D + 2 * B * H * S * DH) * 2 / 2**20
out = {}
for hb in (2, 4, 8, 16):
    t = timed_loop(
        lambda xc, w, wo, ls, lb, k, v, hb=hb: attn_block_decode(
            xc, ls, lb, w, wo, k, v, mask,
            heads=H, head_dim=DH, scale=DH**-0.5, fused_qkv=True,
            slot=slot, layer_idx=li, head_block=hb,
        ),
        x, wqkv, wout, ln_s, ln_b, kc, vc,
    )
    out[f"attn_bf16_hb{hb}"] = round(t * 1e6, 1)
    print(f"attn_block bf16 {mb:.0f}MB head_block={hb} "
          f"(grid={H//hb}): {t*1e6:.1f} us", flush=True)

# xattn tail: to_q only (no cache write), media S=64, inner 1024 (8 heads)
HX, SX = 8, 64
wq_x = jnp.asarray(rng.normal(size=(L, D, HX * DH)) * 0.02, jnp.bfloat16)
wo_x = jnp.asarray(rng.normal(size=(L, HX * DH, D)) * 0.02, jnp.bfloat16)
km = jnp.zeros((L, B, HX, SX, DH), jnp.bfloat16)
vm = jnp.zeros((L, B, HX, SX, DH), jnp.bfloat16)
mask_x = jnp.ones((B, SX), jnp.int32)
gates = jnp.zeros((L,), jnp.float32)
mbx = (D * HX * DH + HX * DH * D + 2 * B * HX * SX * DH) * 2 / 2**20
for hb in (2, 4, 8):
    t = timed_loop(
        lambda xc, w, wo, ls, lb, k, v, g, hb=hb: attn_block_decode(
            xc, ls, lb, w, wo, k, v, mask_x,
            heads=HX, head_dim=DH, scale=DH**-0.5,
            gate=g, layer_idx=li, head_block=hb,
        ),
        x, wq_x, wo_x, ln_s, ln_b, km, vm, gates,
    )
    out[f"xattn_bf16_hb{hb}"] = round(t * 1e6, 1)
    print(f"xattn_block bf16 {mbx:.0f}MB head_block={hb} "
          f"(grid={HX//hb}): {t*1e6:.1f} us", flush=True)

print(json.dumps(out))
