"""Fused media-masked cross-attention Pallas kernel (forward + backward).

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

Backward is a pair of Pallas kernels (same scheme as ops/flash_attention):
the forward saves the per-row logsumexp (lane-broadcast, (BH, Tq, 128));
dq accumulates over K blocks, dk/dv over Q blocks, scores recomputed
blockwise — the training backward never materializes the score tensor
(the recompute-vjp it replaces rebuilt (B·H, Tq, S) fp32 in HBM, exactly
where the reference's MMC4 train loop is hottest,
open_flamingo/train/train_utils.py:118).
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
    *rest,      # [lse_ref (1, BQ, 128) f32,] acc, m, l scratch
    block_q: int,
    block_k: int,
    n_latents: int,
    scale: float,
    with_lse: bool,
):
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        (acc_ref, m_ref, l_ref), lse_ref = rest, None
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
        if with_lse:
            lse_ref[0] = jnp.where(
                l_ref[...] > 0.0, m_ref[...] + jnp.log(l_ref[...]), 0.0
            )


def _xattn_forward(
    q, k, v, text_time, *, n_latents, scale, block_q, block_k, interpret,
    with_lse=False,
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
        with_lse=with_lse,
    )
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, tq, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, tq, 128), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(tq, block_q), pl.cdiv(s, block_k)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, tt)
    if with_lse:
        return res[0], res[1][:, :, 0]
    return res[0]


def _xattn_dq_kernel(
    q_ref,       # (1, BQ, D)
    k_ref,       # (1, BK, D)
    v_ref,       # (1, BK, D)
    tt_ref,      # (1, 1, BQ)
    do_ref,      # (1, BQ, D)
    lse_ref,     # (1, 1, BQ)
    delta_ref,   # (1, 1, BQ)
    dq_ref,      # out (1, BQ, D)
    acc_ref,     # (BQ, D) f32
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

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    k_idx = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    mask = tt_ref[0, 0][:, None] == (k_idx // n_latents + 1)
    lse = lse_ref[0, 0][:, None]
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    do = do_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    dpv = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dpv - delta_ref[0, 0][:, None])
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _xattn_dkv_kernel(
    q_ref,       # (1, BQ, D) — inner grid axis
    k_ref,       # (1, BK, D)
    v_ref,       # (1, BK, D)
    tt_ref,      # (1, 1, BQ)
    do_ref,      # (1, BQ, D)
    lse_ref,     # (1, 1, BQ)
    delta_ref,   # (1, 1, BQ)
    dk_ref,      # out (1, BK, D)
    dv_ref,      # out (1, BK, D)
    dk_acc,      # (BK, D) f32
    dv_acc,      # (BK, D) f32
    *,
    block_q: int,
    block_k: int,
    n_latents: int,
    scale: float,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    k_idx = kj * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    mask = tt_ref[0, 0][:, None] == (k_idx // n_latents + 1)
    lse = lse_ref[0, 0][:, None]
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    do = do_ref[0].astype(jnp.float32)
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = v_ref[0].astype(jnp.float32)
    dpv = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dpv - delta_ref[0, 0][:, None])
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _xattn_backward(
    q, k, v, text_time, out, lse, dout,
    *, n_latents, scale, block_q, block_k, interpret,
):
    bh, tq, d = q.shape
    s = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, s)
    tt = text_time.reshape(bh, 1, tq).astype(jnp.int32)
    lse3 = lse.reshape(bh, 1, tq)
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, tq)

    dq = pl.pallas_call(
        functools.partial(
            _xattn_dq_kernel,
            block_q=block_q, block_k=block_k,
            n_latents=n_latents, scale=scale,
        ),
        grid=(bh, pl.cdiv(tq, block_q), pl.cdiv(s, block_k)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(q, k, v, tt, dout, lse3, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _xattn_dkv_kernel,
            block_q=block_q, block_k=block_k,
            n_latents=n_latents, scale=scale,
        ),
        grid=(bh, pl.cdiv(s, block_k), pl.cdiv(tq, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, tt, dout, lse3, delta)
    return dq, dk, dv


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
    out, lse = _xattn_forward(
        q, k, v, tt, n_latents=n_latents, scale=scale,
        block_q=bq, block_k=bk, interpret=interp, with_lse=True,
    )
    return out, (q, k, v, tt, out, lse)


def _bwd(n_latents, scale, bq, bk, interp, res, g):
    q, k, v, tt, out, lse = res
    dq, dk, dv = _xattn_backward(
        q, k, v, tt, out, lse, g,
        n_latents=n_latents, scale=scale,
        block_q=bq, block_k=bk, interpret=interp,
    )
    return dq, dk, dv, None


masked_xattn.defvjp(_fwd, _bwd)
