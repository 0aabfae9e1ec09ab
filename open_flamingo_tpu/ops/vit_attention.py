"""Batched whole-sequence attention kernel for the ViT (library code;
OFF by default — see use_vit_kernel's measured refutation).

The ViT forward is the training AND generate-prefill hot loop
(open_flamingo/src/flamingo.py:193-197: every image runs the frozen
ViT). At ViT-L/14 shapes (S=257, H=16, Dh=64) generic flash drowns in
per-grid-step overhead (4,608 steps of ~3 MFLOP — measured 4.9
ms/layer vs einsum's 2.4), so this kernel batches WHOLE instances per
grid step: each of the BH/block_bh steps loads q/k/v for block_bh
(seq, head) instances (S_pad x 64 each, ~100 KB) and computes their
full attention entirely in VMEM — fp32 softmax, scores never touch
HBM, 64 grid steps instead of 4,608 (0.32 ms/layer in isolation). S is
padded to a sublane multiple (257 -> 264) by the wrapper; pad keys are
masked in-kernel, pad query rows dropped by the unpad slice. In the
full ViT the pads/transposes it needs cancel the win (BASELINE.md
round-3): XLA's in-graph einsum fusions are already ~86% of the matmul
floor, so the einsum path stays the default.

Backward (freeze_vision=False): custom_vjp recomputes through the
einsum reference — the released models freeze the ViT
(open_flamingo/src/factory.py:104-113), so the backward is a
correctness fallback, not a hot path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# Test hooks mirroring ops/dense_stream: FORCE routes the ViT through
# the kernel on any backend (interpret on CPU via INTERPRET), DISABLE
# forces the einsum path on TPU (A/B).
FORCE = False
DISABLE = False
INTERPRET = False


def use_vit_kernel() -> bool:
    """Default OFF: measured on-TPU (r3, B=32 ViT-L), XLA's einsum path
    runs the full ViT at 43.9 ms device vs a ~38 ms bf16 matmul floor
    (~86% efficient); this kernel cuts attention from 2.4 to 0.32
    ms/layer in isolation but the S=257->264 pads + head transposes it
    needs give the win back (45.0 ms total). Kept as tested library
    code + FORCE hook; see BASELINE.md round-3 notes."""
    if DISABLE:
        return False
    return FORCE


def _vit_attn_kernel(
    q_ref,   # (BB, S_pad, D) — pre-scaled queries
    k_ref,
    v_ref,
    o_ref,
    *,
    block_bh: int,
    s_real: int,
):
    s_pad = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    valid = col < s_real
    for i in range(block_bh):
        q = q_ref[i].astype(jnp.float32)
        k = k_ref[i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                      # (S_pad, S_pad)
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = jnp.where(valid, p, 0.0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / denom                           # rows always have >=1 valid
        o_ref[i] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _vit_attention_fwd_impl(q, k, v, *, scale, block_bh, interpret):
    bh, s, d = q.shape
    s_pad = -(-s // 8) * 8
    while bh % block_bh:
        block_bh //= 2
    pad = [(0, 0), (0, s_pad - s), (0, 0)]
    qp = jnp.pad((q.astype(jnp.float32) * scale).astype(q.dtype), pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)

    out = pl.pallas_call(
        functools.partial(
            _vit_attn_kernel, block_bh=block_bh, s_real=s
        ),
        grid=(bh // block_bh,),
        in_specs=[
            pl.BlockSpec((block_bh, s_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_bh, s_pad, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_bh, s_pad, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_bh, s_pad, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :s]


def _flat_attn_kernel(
    q_ref,   # (1, S_pad, W) — W = heads_per_block * dh flat columns
    k_ref,
    v_ref,
    o_ref,
    *,
    hpb: int,
    dh: int,
    s_real: int,
    scale: float,
):
    s_pad = q_ref.shape[1]
    w = q_ref.shape[2]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    kvalid = kcol < s_real
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # head-of-column map: the 2x-K masked dot keeps the lane width at
    # 128 (Mosaic block rule) while heads never mix — zeroing the
    # complementary head's columns makes (q*m) @ (k*m)^T == q_h @ k_h^T
    head_of = jax.lax.broadcasted_iota(jnp.int32, (s_pad, w), 1) // dh
    out = jnp.zeros((s_pad, w), jnp.float32)
    for sub in range(hpb):
        m = head_of == sub
        qh = jnp.where(m, q, 0.0)
        kh = jnp.where(m, k, 0.0)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                 # (S_pad, S_pad)
        s = jnp.where(kvalid, s, NEG_INF)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = jnp.where(kvalid, p, 0.0)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        vh = jnp.where(m, v, 0.0)
        out = out + jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = out.astype(o_ref.dtype)


def flat_vit_attention(
    q: jax.Array,        # (B, S_pad, D) — FLAT head layout, D = H * dh
    k: jax.Array,
    v: jax.Array,
    scale: float,
    *,
    heads: int,
    s_real: int,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Bidirectional attention consuming the flat (B, S_pad, H*dh)
    layout DIRECTLY — no head transpose, no (B,H,S,dh) copies. This is
    the absorbed-ViT glue (BASELINE.md round-4 lever (a)): the absorbed
    side schedule keeps q/k/v as flat (M, D) workspace tiles, and the
    head split happens in the kernel's column blocking instead of an
    XLA transpose (~25 ms of copies per 24-layer ViT at B=32).

    Grid (B, H/hpb); each cell loads a (S_pad, hpb*dh) column block
    (lane width kept at a multiple of 128 by pairing heads when
    dh < 128) and computes hpb heads' full attention in VMEM with
    masked dual-head dots. Keys at positions >= s_real are masked; pad
    QUERY rows produce finite garbage (uniform attention over real
    keys) and are ignored by the caller's layout.

    Returns (B, S_pad, D) in q.dtype."""
    b, s_pad, d = q.shape
    assert d % heads == 0
    dh = d // heads
    hpb = max(1, 128 // dh) if d > 128 else heads
    while heads % hpb:
        hpb -= 1
    w = hpb * dh
    assert w % 128 == 0 or w == d, (
        f"flat attention needs head column blocks of 128n lanes or the "
        f"full width: dh={dh}, hpb={hpb} gives {w} (D={d})"
    )
    interpret = INTERPRET if interpret is None else interpret
    return pl.pallas_call(
        functools.partial(
            _flat_attn_kernel, hpb=hpb, dh=dh, s_real=s_real, scale=scale
        ),
        grid=(b, heads // hpb),
        in_specs=[
            pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(q, k, v)


def _reference(q, k, v, scale):
    logits = jnp.einsum(
        "bqd,bkd->bqk", q.astype(jnp.float32) * scale,
        k.astype(jnp.float32),
    )
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def vit_attention(
    q: jax.Array,        # (BH, S, D)
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_bh: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Full bidirectional attention, one grid step per block_bh
    (batch, head) instances. Returns (BH, S, D)."""
    interpret = INTERPRET if interpret is None else interpret
    return _vit_attention_fwd_impl(
        q, k, v, scale=scale, block_bh=block_bh, interpret=interpret
    )


def _fwd(q, k, v, scale, block_bh, interpret):
    interpret = INTERPRET if interpret is None else interpret
    out = _vit_attention_fwd_impl(
        q, k, v, scale=scale, block_bh=block_bh, interpret=interpret
    )
    return out, (q, k, v)


def _bwd(scale, block_bh, interpret, res, g):
    # recompute-vjp through the einsum reference (the ViT is frozen in
    # every released config; this path exists for freeze_vision=False)
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, scale), q, k, v)
    return vjp(g)


vit_attention.defvjp(_fwd, _bwd)
