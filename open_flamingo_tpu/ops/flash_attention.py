"""Fused (flash) attention Pallas TPU kernels — forward AND backward.

Streaming-softmax attention over K/V blocks: logits never materialize in
HBM — the (B, H, T, S) fp32 score tensor of the reference einsum path
(536MB at B=128, T=S=256, H=16) stays in VMEM tiles. Supports:

  * causal masking with a runtime query-position offset (prefill into a
    KV cache writes queries at slots [q_offset, q_offset+Tq)) — the
    offset is an SMEM scalar so cached prefill stays one compiled graph;
  * key padding mask (B, S);
  * ALiBi additive bias computed in-kernel from per-head slopes
    (key-position-only form, models/decoders/common.py:alibi_bias) —
    the (H, S) bias tensor is never materialized.

Backward is a pair of Pallas kernels (FlashAttention-2 style): the
forward saves the per-row logsumexp; dq accumulates over K blocks, dk/dv
accumulate over Q blocks, and the score tensor is recomputed blockwise —
it never materializes in the backward either (the recompute-vjp it
replaces rebuilt the full (B·H, Tq, S) fp32 scores in HBM). Numerics
match the einsum reference's VJP (tests/test_flash.py).

The logsumexp residual is stored lane-broadcast as (BH, Tq, 128) — the
running max/denominator scratch already lives in that layout, and TPU
stores want a 128-lane minor dimension (the official JAX TPU flash
kernel uses the same trick).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _attention_kernel(
    off_ref,      # (1,) int32 scalar-prefetch: q position offset
    q_ref,        # (1, BQ, D)
    k_ref,        # (1, BK, D)
    v_ref,        # (1, BK, D)
    pad_ref,      # (1, 1, BK) int32 key padding (1 = valid)
    slope_ref,    # (1, 1, 1) f32 per-head ALiBi slope (0 disables)
    out_ref,      # (1, BQ, D)
    *rest,        # [lse_ref (1, BQ, 128) f32,] acc, m, l scratch
    block_q: int,
    block_k: int,
    kv_len: int,
    causal: bool,
    scale: float,
    with_lse: bool,
):
    if with_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        (acc_ref, m_ref, l_ref), lse_ref = rest, None
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q_start = qi * block_q + off_ref[0]
    k_start = ki * block_k

    def compute():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)

        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        slope = slope_ref[0, 0, 0]
        s = s + slope * (k_pos - (kv_len - 1)).astype(jnp.float32)

        mask = pad_ref[0, 0][None, :] > 0
        if kv_len % block_k != 0:
            # ragged S (e.g. the ViT's 257 = 2x128 + 1): the last K
            # block's out-of-bounds K/V/pad reads are undefined — AND in
            # the bound and zero the OOB V rows (p=0 times NaN is NaN)
            mask = mask & (k_pos < kv_len)
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = mask & (k_pos <= q_pos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        # fully-masked rows: exp(NEG_INF - NEG_INF) = 1 — zero them
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0].astype(jnp.float32)
        if kv_len % block_k != 0:
            vrow = k_start + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0
            )
            v = jnp.where(vrow < kv_len, v, 0.0)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    if causal:
        # skip K blocks entirely above the causal diagonal
        @pl.when(k_start <= q_start + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        denom = l_ref[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)
        if with_lse:
            # exp(s - lse) reproduces the normalized probabilities in the
            # backward; fully-masked rows get lse = 0 (their p is remasked
            # to 0 there anyway, this just avoids NaNs).
            lse_ref[0] = jnp.where(
                l_ref[...] > 0.0, m_ref[...] + jnp.log(l_ref[...]), 0.0
            )


def _flash_forward(
    q, k, v, pad_mask, slopes, q_offset,
    *, causal, scale, block_q, block_k, interpret, with_lse=False,
):
    bh, tq, d = q.shape
    s = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, s)
    grid = (bh, pl.cdiv(tq, block_q), pl.cdiv(s, block_k))
    off = jnp.asarray(q_offset, jnp.int32).reshape(1)
    pad_mask = pad_mask.reshape(bh, 1, s)
    slopes = slopes.reshape(bh, 1, 1)

    kernel = functools.partial(
        _attention_kernel,
        block_q=block_q,
        block_k=block_k,
        kv_len=s,
        causal=causal,
        scale=scale,
        with_lse=with_lse,
    )
    out_specs = [pl.BlockSpec((1, block_q, d), lambda b, i, j, off: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, tq, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda b, i, j, off: (b, i, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((bh, tq, 128), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j, off: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j, off: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j, off: (b, j, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j, off: (b, 0, j)),
            pl.BlockSpec((1, 1, 1), lambda b, i, j, off: (b, 0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(off, q, k, v, pad_mask, slopes)
    if with_lse:
        return res[0], res[1][:, :, 0]  # (bh, tq, d), (bh, tq)
    return res[0]


def _flash_dq_kernel(
    off_ref,      # (1,) scalar prefetch
    q_ref,        # (1, BQ, D)
    k_ref,        # (1, BK, D)
    v_ref,        # (1, BK, D)
    pad_ref,      # (1, 1, BK)
    slope_ref,    # (1, 1, 1)
    do_ref,       # (1, BQ, D)
    lse_ref,      # (1, 1, BQ) f32
    delta_ref,    # (1, 1, BQ) f32: rowsum(dout * out)
    dq_ref,       # out (1, BQ, D)
    acc_ref,      # (BQ, D) f32 scratch
    *,
    block_q: int,
    block_k: int,
    kv_len: int,
    causal: bool,
    scale: float,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q + off_ref[0]
    k_start = ki * block_k

    def compute():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = s + slope_ref[0, 0, 0] * (k_pos - (kv_len - 1)).astype(jnp.float32)
        mask = pad_ref[0, 0][None, :] > 0
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = mask & (k_pos <= q_pos)

        lse = lse_ref[0, 0][:, None]               # (BQ, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)  # normalized probs
        do = do_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) = do @ v^T
        ds = p * (dpv - delta_ref[0, 0][:, None])
        acc_ref[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        @pl.when(k_start <= q_start + block_q - 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        # s = scale * q·k  =>  d/dq = scale * (ds @ k)
        dq_ref[0] = (acc_ref[...] * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(
    off_ref,      # (1,) scalar prefetch
    q_ref,        # (1, BQ, D) — inner grid axis
    k_ref,        # (1, BK, D)
    v_ref,        # (1, BK, D)
    pad_ref,      # (1, 1, BK)
    slope_ref,    # (1, 1, 1)
    do_ref,       # (1, BQ, D)
    lse_ref,      # (1, 1, BQ)
    delta_ref,    # (1, 1, BQ)
    dk_ref,       # out (1, BK, D)
    dv_ref,       # out (1, BK, D)
    dk_acc,       # (BK, D) f32 scratch
    dv_acc,       # (BK, D) f32 scratch
    *,
    block_q: int,
    block_k: int,
    kv_len: int,
    causal: bool,
    scale: float,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q + off_ref[0]
    k_start = kj * block_k

    def compute():
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        k_pos = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = s + slope_ref[0, 0, 0] * (k_pos - (kv_len - 1)).astype(jnp.float32)
        mask = pad_ref[0, 0][None, :] > 0
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            mask = mask & (k_pos <= q_pos)

        lse = lse_ref[0, 0][:, None]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        do = do_ref[0].astype(jnp.float32)
        dv_acc[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BK, D) = p^T @ do
        v = v_ref[0].astype(jnp.float32)
        dpv = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dpv - delta_ref[0, 0][:, None])
        # q already carries the softmax scale => dk = ds^T @ (scale·q)
        dk_acc[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        @pl.when(q_start + block_q - 1 >= k_start)
        def _():
            compute()
    else:
        compute()

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward(
    q, k, v, pad_mask, slopes, q_offset, out, lse, dout,
    *, causal, scale, block_q, block_k, interpret,
):
    bh, tq, d = q.shape
    s = k.shape[1]
    block_q = min(block_q, tq)
    block_k = min(block_k, s)
    off = jnp.asarray(q_offset, jnp.int32).reshape(1)
    pad3 = pad_mask.reshape(bh, 1, s)
    slopes3 = slopes.reshape(bh, 1, 1)
    lse3 = lse.reshape(bh, 1, tq)
    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(bh, 1, tq)

    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel,
            block_q=block_q, block_k=block_k, kv_len=s,
            causal=causal, scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, pl.cdiv(tq, block_q), pl.cdiv(s, block_k)),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j, off: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, off: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j, off: (b, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, i, j, off: (b, 0, j)),
                pl.BlockSpec((1, 1, 1), lambda b, i, j, off: (b, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda b, i, j, off: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, i, j, off: (b, 0, i)),
                pl.BlockSpec((1, 1, block_q), lambda b, i, j, off: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d), lambda b, i, j, off: (b, i, 0)
            ),
            scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        interpret=interpret,
    )(off, q, k, v, pad3, slopes3, dout, lse3, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel,
            block_q=block_q, block_k=block_k, kv_len=s,
            causal=causal, scale=scale,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, pl.cdiv(s, block_k), pl.cdiv(tq, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, j, i, off: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, off: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, off: (b, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda b, j, i, off: (b, 0, j)),
                pl.BlockSpec((1, 1, 1), lambda b, j, i, off: (b, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda b, j, i, off: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q), lambda b, j, i, off: (b, 0, i)),
                pl.BlockSpec((1, 1, block_q), lambda b, j, i, off: (b, 0, i)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, d), lambda b, j, i, off: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, j, i, off: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), k.dtype),
            jax.ShapeDtypeStruct((bh, s, d), v.dtype),
        ],
        interpret=interpret,
    )(off, q, k, v, pad3, slopes3, dout, lse3, delta)
    return dq, dk, dv


def reference_attention(q, k, v, pad_mask, slopes, q_offset, *, causal, scale):
    """Einsum reference with identical semantics (used for parity tests).
    Shapes as flash_attention."""
    bh, tq, d = q.shape
    s = k.shape[1]
    logits = jnp.einsum(
        "bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    k_pos = jnp.arange(s)[None, None, :]
    logits = logits + slopes[:, :, None] * (k_pos - (s - 1)).astype(jnp.float32)
    mask = pad_mask[:, None, :] > 0
    if causal:
        q_pos = q_offset + jnp.arange(tq)[None, :, None]
        mask = mask & (k_pos <= q_pos)
    logits = jnp.where(mask, logits, NEG_INF)
    m = jax.lax.stop_gradient(logits.max(-1, keepdims=True))
    p = jnp.exp(logits - m)
    p = jnp.where(mask, p, 0.0)
    denom = p.sum(-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = jnp.einsum("bqk,bkd->bqd", (p / denom).astype(jnp.float32), v.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def flash_attention(
    q, k, v, pad_mask, slopes, q_offset,
    causal: bool = True,
    scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """q: (BH, Tq, D); k/v: (BH, S, D); pad_mask: (BH, S) int32;
    slopes: (BH, 1) f32; q_offset: scalar int32 (traced OK)."""
    return _flash_forward(
        q, k, v, pad_mask, slopes, q_offset,
        causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


def _fwd(q, k, v, pad_mask, slopes, q_offset, causal, scale, bq, bk, interp):
    out, lse = _flash_forward(
        q, k, v, pad_mask, slopes, q_offset,
        causal=causal, scale=scale, block_q=bq, block_k=bk,
        interpret=interp, with_lse=True,
    )
    return out, (q, k, v, pad_mask, slopes, q_offset, out, lse)


def _bwd(causal, scale, bq, bk, interp, res, g):
    q, k, v, pad_mask, slopes, q_offset, out, lse = res
    dq, dk, dv = _flash_backward(
        q, k, v, pad_mask, slopes, q_offset, out, lse, g,
        causal=causal, scale=scale, block_q=bq, block_k=bk, interpret=interp,
    )
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fwd, _bwd)
