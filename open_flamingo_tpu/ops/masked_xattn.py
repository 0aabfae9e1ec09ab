"""Fused media-masked cross-attention Pallas kernel.

The gated-xattn hot path (BASELINE north star): text queries attend to
media latents under the Flamingo media-time rule. The (B, H, T_txt,
T_img*n_latents) mask/score tensors never materialize — the media time of
each K/V position is computed in-kernel from its index (media j spans
latents [j*n, (j+1)*n), media_time = j+1) and compared to the query's
text_time streamed in per block.

Immediate mode (text_time == media_time, the released models' config):
rows with text_time == 0 are fully masked; the zero-denominator guard
yields exactly 0 — the reference's post-softmax zeroing
(open_flamingo/src/helpers.py:223-229). The "attend to all previous"
(>=) mode keeps the einsum path (its fully-masked rows are uniform, a
reference quirk the kernel intentionally does not reproduce).

Backward = recompute via custom_vjp over the einsum reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _xattn_kernel(
    q_ref,      # (1, BQ, D)
    k_ref,      # (1, BK, D)
    v_ref,      # (1, BK, D)
    tt_ref,     # (1, 1, BQ) int32 text_time per query
    out_ref,    # (1, BQ, D)
    acc_ref,    # (BQ, D) f32
    m_ref,      # (BQ, 128) f32
    l_ref,      # (BQ, 128) f32
    *,
    block_q: int,
    block_k: int,
    n_latents: int,
    scale: float,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    k_idx = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    media_time = k_idx // n_latents + 1
    text_time = tt_ref[0, 0][:, None]  # (BQ, 1)
    mask = text_time == media_time
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        denom = l_ref[:, :1]
        # text before the first image: fully masked -> exact zeros
        denom = jnp.where(denom == 0.0, 1.0, denom)
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)


def _xattn_forward(
    q, k, v, text_time, *, n_latents, scale, block_q, block_k, interpret
):
    bh, tq, d = q.shape
    s = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, s)
    tt = text_time.reshape(bh, 1, tq).astype(jnp.int32)
    kernel = functools.partial(
        _xattn_kernel,
        block_q=block_q,
        block_k=block_k,
        n_latents=n_latents,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(tq, block_q), pl.cdiv(s, block_k)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, tt)


def reference_masked_xattn(q, k, v, text_time, *, n_latents, scale):
    """Einsum reference, immediate-mode semantics incl. exact zeros for
    text_time == 0 rows."""
    bh, tq, d = q.shape
    s = k.shape[1]
    logits = jnp.einsum(
        "bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    media_time = jnp.arange(s) // n_latents + 1
    mask = text_time[:, :, None] == media_time[None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    m = jax.lax.stop_gradient(logits.max(-1, keepdims=True))
    p = jnp.where(mask, jnp.exp(logits - m), 0.0)
    denom = p.sum(-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = jnp.einsum(
        "bqk,bkd->bqd", (p / denom), v.astype(jnp.float32)
    )
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def masked_xattn(
    q, k, v, text_time,
    n_latents: int,
    scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """q: (BH, Tq, D); k/v: (BH, T_img*n_latents, D);
    text_time: (BH, Tq) int32."""
    return _xattn_forward(
        q, k, v, text_time,
        n_latents=n_latents, scale=scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _fwd(q, k, v, tt, n_latents, scale, bq, bk, interp):
    out = _xattn_forward(
        q, k, v, tt, n_latents=n_latents, scale=scale,
        block_q=bq, block_k=bk, interpret=interp,
    )
    return out, (q, k, v, tt)


def _bwd(n_latents, scale, bq, bk, interp, res, g):
    q, k, v, tt = res

    def f(q, k, v):
        return reference_masked_xattn(
            q, k, v, tt, n_latents=n_latents, scale=scale
        )

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


masked_xattn.defvjp(_fwd, _bwd)
