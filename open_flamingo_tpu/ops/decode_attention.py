"""Fused single-token decode attention Pallas TPU kernel.

The autoregressive decode hot path: one query token per sequence attends
to the KV cache. XLA's lowering for this pattern (dynamic_update_slice of
the new token's K/V + a batched-matvec einsum) promotes the whole cache
into VMEM every step through latency-bound chunked async copies
(~150us/layer measured for caches that should take ~20us of DMA) and
leaves a trail of small convert/reduce ops. This kernel does the whole
per-layer decode attention in one launch:

  * writes the current token's K/V into the cache at the decode slot
    (in-place via input/output aliasing — only the S-block containing
    the slot is flushed, the rest of the cache is never touched);
  * streams the cache blocks at DMA line rate, overlaying the new token
    in-register for the attention itself;
  * masks, streaming-softmaxes and weight-sums entirely in VMEM.

Layout: the KV cache is head-major (B, H, S, Dh) so cache blocks are
contiguous per batch row and the flash/prefill path's (B*H, S, D) view
is a free reshape.

Masking: a (B, S) validity mask (pad/causality already folded in by the
caller — during decode every written, non-pad slot is visible). Rows
whose mask is all-zero produce exact zeros (used by the gated-xattn
media rule for text before the first image).

ALiBi: optional per-head slopes, key-position-only form
slope * (j - (S-1)) — identical (up to softmax translation invariance)
to the HF MPT bias the einsum path adds.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _decode_kernel(
    slot_ref,   # (1,) s32 scalar-prefetch: cache slot of the new token
    q_ref,      # (1, H, D)
    k_ref,      # (1, H, BK, D)
    v_ref,      # (1, H, BK, D)
    mask_ref,   # (1, 1, BK) int32
    slope_ref,  # (1, 1, H) f32 per-head ALiBi slopes
    *rest,      # [kn_ref (1,H,1,D), vn_ref (1,H,1,D)], out_ref,
                # [ko_ref (1,H,BK,D), vo_ref], acc, m, l scratch
    block_k: int,
    kv_len: int,
    scale: float,
    use_alibi: bool,
    update: bool,
):
    if update:
        kn_ref, vn_ref, out_ref, ko_ref, vo_ref, acc_ref, m_ref, l_ref = rest
    else:
        out_ref, acc_ref, m_ref, l_ref = rest
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale        # (H, D)
    k = k_ref[0]                                    # (H, BK, D)
    slot = slot_ref[0]
    in_block = jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k, 1), 1
    ) + ki * block_k == slot                        # (1, BK, 1)

    if update:
        # overlay the new token's K/V in-register for this step's
        # attention, and flush the updated slot block back to the cache
        # (the other blocks are never written — in/out are aliased).
        # kn/vn arrive as (1, H, 1, D) blocks so the (H, 1, D) view is a
        # block squeeze, not an in-kernel reshape (Mosaic cannot lower
        # the (H, D) -> (H, 1, D) shape cast at sub-lane head dims)
        k = jnp.where(in_block, kn_ref[0].astype(k.dtype), k)
        v_new = jnp.where(in_block, vn_ref[0].astype(k.dtype), v_ref[0])

        @pl.when(ki == slot // block_k)
        def _write():
            ko_ref[0] = k
            vo_ref[0] = v_new
    else:
        v_new = v_ref[0]

    # batched matvec s[h, j] = sum_d q[h, d] * k[h, j, d] as a VPU
    # broadcast-multiply + lane reduction (Mosaic cannot lower a
    # dot_general whose LHS has only batch + contracting dims, and the
    # decode step is bandwidth-bound — MXU utilization is irrelevant).
    s = jnp.sum(q[:, None, :] * k.astype(jnp.float32), axis=-1)  # (H, BK)

    if use_alibi:
        k_pos = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = s + slope_ref[0, 0][:, None] * (
            k_pos - (kv_len - 1)
        ).astype(jnp.float32)

    mask = mask_ref[0, 0][None, :] > 0              # (1, BK)
    if kv_len % block_k != 0:
        # Ragged S: the last grid block's out-of-bounds K/V/mask reads
        # are undefined on TPU — AND in the in-kernel bound so garbage
        # mask bytes can never admit garbage keys (silent wrong logits),
        # and zero the OOB V rows (p=0 times NaN garbage is still NaN).
        j = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, mask.shape, 1
        )
        mask = jnp.logical_and(mask, j < kv_len)
        jv = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, v_new.shape, 1
        )
        v_new = jnp.where(jv < kv_len, v_new, jnp.zeros_like(v_new))
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)    # (H, BK)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    pv = jnp.sum(p[:, :, None] * v_new.astype(jnp.float32), axis=1)  # (H, D)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == pl.num_programs(1) - 1)
    def _finalize():
        denom = l_ref[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)  # all-masked row -> 0
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)


def _call(
    q, k, v, mask, slopes, slot, k_new, v_new,
    *, scale, block_k, interpret, update,
):
    b, h, s, d = k.shape
    block_k = min(block_k, s)
    mask3 = mask.astype(jnp.int32).reshape(b, 1, s)
    if slopes is None:
        slopes3 = jnp.zeros((1, 1, h), jnp.float32)
    else:
        slopes3 = jnp.asarray(slopes, jnp.float32).reshape(1, 1, h)
    slot1 = jnp.asarray(slot, jnp.int32).reshape(1)
    kernel = functools.partial(
        _decode_kernel,
        block_k=block_k,
        kv_len=s,
        scale=scale,
        use_alibi=slopes is not None,
        update=update,
    )
    n_kb = pl.cdiv(s, block_k)
    in_specs = [
        pl.BlockSpec((1, h, d), lambda bi, ki, slot: (bi, 0, 0)),
        pl.BlockSpec((1, h, block_k, d), lambda bi, ki, slot: (bi, 0, ki, 0)),
        pl.BlockSpec((1, h, block_k, d), lambda bi, ki, slot: (bi, 0, ki, 0)),
        pl.BlockSpec((1, 1, block_k), lambda bi, ki, slot: (bi, 0, ki)),
        pl.BlockSpec((1, 1, h), lambda bi, ki, slot: (0, 0, 0)),
    ]
    out_specs = [pl.BlockSpec((1, h, d), lambda bi, ki, slot: (bi, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, d), q.dtype)]
    operands = [q, k, v, mask3, slopes3]
    aliases = {}
    if update:
        in_specs += [
            pl.BlockSpec((1, h, 1, d), lambda bi, ki, slot: (bi, 0, 0, 0)),
            pl.BlockSpec((1, h, 1, d), lambda bi, ki, slot: (bi, 0, 0, 0)),
        ]
        operands += [k_new[:, :, None, :], v_new[:, :, None, :]]
        # updated cache: only the S-block containing the slot is flushed
        out_specs += [
            pl.BlockSpec(
                (1, h, block_k, d),
                lambda bi, ki, slot: (bi, 0, slot[0] // block_k, 0),
            ),
            pl.BlockSpec(
                (1, h, block_k, d),
                lambda bi, ki, slot: (bi, 0, slot[0] // block_k, 0),
            ),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ]
        # positional args: (slot, q, k, v, mask, slopes, k_new, v_new)
        aliases = {2: 1, 3: 2}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_kb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((h, d), jnp.float32),
                pltpu.VMEM((h, 128), jnp.float32),
                pltpu.VMEM((h, 128), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(slot1, *operands)
    return tuple(res) if update else res[0]


def decode_attention(
    q: jax.Array,          # (B, H, D)
    k: jax.Array,          # (B, H, S, D)
    v: jax.Array,          # (B, H, S, D)
    mask: jax.Array,       # (B, S) int32/bool, 1 = attend
    *,
    scale: float = 1.0,
    slopes=None,           # static (H,) ALiBi slopes (numpy) or None
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Attention only (static K/V, e.g. cached media latents).
    Returns (B, H, D); rows with an all-zero mask are exact zeros."""
    return _call(
        q, k, v, mask, slopes, 0, None, None,
        scale=scale, block_k=block_k, interpret=interpret, update=False,
    )


def decode_attention_update(
    q: jax.Array,          # (B, H, D)
    k_cache: jax.Array,    # (B, H, S, D) — donated, updated in place
    v_cache: jax.Array,    # (B, H, S, D) — donated, updated in place
    k_new: jax.Array,      # (B, H, D) current token's key
    v_new: jax.Array,      # (B, H, D) current token's value
    mask: jax.Array,       # (B, S) — must mark `slot` valid
    slot,                  # scalar int32 cache slot for the new token
    *,
    scale: float = 1.0,
    slopes=None,
    block_k: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Write-then-attend decode step: returns (out, k_cache', v_cache')."""
    return _call(
        q, k_cache, v_cache, mask, slopes, slot, k_new, v_new,
        scale=scale, block_k=block_k, interpret=interpret, update=True,
    )


def reference_decode_attention(q, k, v, mask, *, scale=1.0, slopes=None):
    """Einsum reference with identical semantics (parity tests)."""
    b, h, s, d = k.shape
    logits = jnp.einsum(
        "bhd,bhkd->bhk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    if slopes is not None:
        k_pos = jnp.arange(s, dtype=jnp.float32) - (s - 1)
        logits = logits + jnp.asarray(slopes, jnp.float32)[None, :, None] * k_pos
    m = mask.astype(bool)[:, None, :]
    logits = jnp.where(m, logits, NEG_INF)
    mx = logits.max(-1, keepdims=True)
    p = jnp.where(m, jnp.exp(logits - mx), 0.0)
    denom = p.sum(-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    out = jnp.einsum("bhk,bhkd->bhd", p / denom, v.astype(jnp.float32))
    return out.astype(q.dtype)
