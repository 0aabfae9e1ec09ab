"""Merged attend+output-projection decode kernel.

The fused decode path streams each layer's weights at HBM line rate
(dense_stream kernels), but at B<=64 every extra launch still pays a
fixed dispatch/pipeline cost that is material next to a 10-50us weight
stream. This kernel merges the *attention tail* of a decode layer into
one launch with a head-indexed grid:

    for h in heads:                       # grid dimension, pipelined
        cache[h, slot] = (k_new[h], v_new[h])     # aliased slot block
        a_h  = softmax(q_h K_h^T + bias_h) V_h    # fp32, masked
        acc += a_h @ Wout[h]                      # per-head out-proj
    y = acc * tanh(gate)? + residual?

so one launch covers what was previously attention kernel + output
projection (+ gate + residual), and the Wout stream overlaps the attend
compute through Mosaic's block pipeline. Used for both the self-attention
tail (with the in-place cache write, ALiBi optional) and the gated
cross-attention tail over the static cached media K/V (mask = media-time
equality; all-masked rows contribute exact zeros — the immediate-mode
rule of the reference, open_flamingo/src/helpers.py:167-176).

All tensor blocks keep the layouts the proven decode_attention kernel
uses ((B, 1, ...) head slices, head-major caches) — no in-kernel
sublane/lane-crossing reshapes, which Mosaic cannot lower.

Replaced torch path: HF per-layer decode driven by
open_flamingo/src/flamingo.py:124-175 generate().
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# attn_block_decode grid = heads/HEAD_BLOCK groups; env-overridable for
# on-TPU A/B sweeps (scripts_dev/tpu_knob_ab.py), read once at import.
# Round-4 sweep: head groups of 4 beat 8 in the scan engine (+200
# tok/s int4 B=32 — smaller exposed fill per launch); the legacy
# unrolled layout keeps 8 (unmeasured there, compile cache stays warm).
import os as _os

HEAD_BLOCK = int(_os.environ.get("OFT_HEAD_BLOCK", "4"))
# own env var (not OFT_HEAD_BLOCK): a sweep tuning the scan engine must
# not silently re-block the unrolled layout and cold its ~25-min compiles
HEAD_BLOCK_UNROLLED = int(_os.environ.get("OFT_HEAD_BLOCK_UNROLLED", "8"))


def _pick_block_s(s_max: int, block_s: int) -> int:
    """Slot-flush block size: a sublane-aligned divisor of S, else the
    whole cache (always legal — full-dim blocks bypass tiling rules)."""
    for bs in (block_s, 16, 8):
        if bs <= s_max and s_max % bs == 0:
            return bs
    return s_max


def _attend_out_kernel(
    slot_ref,       # (1,) int32 scalar prefetch (0 when update=False)
    q_ref,          # (B, 1, 1, Dh) — this head's queries (pre-scaled)
    k_ref,          # (B, 1, S, Dh) this head's cache/media keys
    v_ref,
    mask_ref,       # (B, S) int32 validity
    slope_ref,      # (1, 1, 1) f32 — this head's ALiBi slope block
    wout_ref,       # (1, Dh, D) this head's slice of the out projection
    *rest,
    kv_len, block_s, use_alibi, update, has_bias, has_gate, has_residual,
    has_wscale, int8kv,
):
    i = 0
    kn_ref = vn_ref = None
    if update:
        kn_ref, vn_ref = rest[i], rest[i + 1]
        i += 2
    ks_ref = vs_ref = None
    if int8kv:
        ks_ref, vs_ref = rest[i], rest[i + 1]   # (B, 1, S) f32 scales
        i += 2
    ws_ref = rest[i] if has_wscale else None
    i += has_wscale
    bias_ref = rest[i] if has_bias else None
    i += has_bias
    gate_ref = rest[i] if has_gate else None
    i += has_gate
    res_ref = rest[i] if has_residual else None
    i += has_residual
    y_ref = rest[i]
    i += 1
    if update:
        ko_ref, vo_ref = rest[i], rest[i + 1]
        i += 2
        if int8kv:
            kso_ref, vso_ref = rest[i], rest[i + 1]
            i += 2
    acc_ref = rest[i]

    h = pl.program_id(0)

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[:, 0, 0].astype(jnp.float32)              # (B, Dh)
    k = k_ref[:, 0]                                     # (B, S, Dh)
    v = v_ref[:, 0]
    if int8kv:
        ks = ks_ref[0]                                  # (B, S) f32
        vs = vs_ref[0]
    slot = slot_ref[0]

    if update:
        if int8kv:
            # quantize the new token in-kernel (per-row symmetric int8);
            # the overlay attends to the QUANTIZED value — exactly what
            # later steps read back from the cache
            kn_f = kn_ref[:, 0].astype(jnp.float32)     # (B, 1, Dh)
            vn_f = vn_ref[:, 0].astype(jnp.float32)
            k_amax = jnp.max(jnp.abs(kn_f), axis=-1, keepdims=True)
            v_amax = jnp.max(jnp.abs(vn_f), axis=-1, keepdims=True)
            s_kn = jnp.where(k_amax == 0.0, 1.0, k_amax / 127.0)  # (B,1,1)
            s_vn = jnp.where(v_amax == 0.0, 1.0, v_amax / 127.0)
            kn = jnp.clip(jnp.round(kn_f / s_kn), -127, 127)
            vn = jnp.clip(jnp.round(vn_f / s_vn), -127, 127)
        else:
            # (B, 1, Dh) via block squeeze — NOT an in-kernel reshape of
            # the (B, Dh) row, which Mosaic cannot lower at small B/Dh
            kn = kn_ref[:, 0].astype(k.dtype)           # (B, 1, Dh)
            vn = vn_ref[:, 0].astype(v.dtype)
        # flush only the S-block containing the slot (aliased cache)
        blk = slot // block_s
        off = slot - blk * block_s
        in_blk = (
            jax.lax.broadcasted_iota(jnp.int32, (1, block_s, 1), 1) == off
        )
        k_blk = k_ref[:, 0, pl.ds(blk * block_s, block_s), :]
        v_blk = v_ref[:, 0, pl.ds(blk * block_s, block_s), :]
        if int8kv:
            ko_ref[:, 0] = jnp.where(
                in_blk, kn, k_blk.astype(jnp.float32)
            ).astype(ko_ref.dtype)
            vo_ref[:, 0] = jnp.where(
                in_blk, vn, v_blk.astype(jnp.float32)
            ).astype(vo_ref.dtype)
        else:
            ko_ref[:, 0] = jnp.where(in_blk, kn, k_blk)
            vo_ref[:, 0] = jnp.where(in_blk, vn, v_blk)
        # overlay the new token in-register for this step's attention
        at_slot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, kv_len, 1), 1) == slot
        )
        if int8kv:
            k = jnp.where(at_slot, kn, k.astype(jnp.float32))
            v = jnp.where(at_slot, vn, v.astype(jnp.float32))
            at_slot2 = (
                jax.lax.broadcasted_iota(jnp.int32, (1, kv_len), 1) == slot
            )
            ks = jnp.where(at_slot2, s_kn[:, :, 0], ks)
            vs = jnp.where(at_slot2, s_vn[:, :, 0], vs)
            # scale planes are tiny: write the full overlaid (B, S) row
            # ((B,1,S)-style slot blocks are not Mosaic-lowerable)
            kso_ref[0] = ks
            vso_ref[0] = vs
        else:
            k = jnp.where(at_slot, kn, k)
            v = jnp.where(at_slot, vn, v)

    s = jnp.sum(q[:, None, :] * k.astype(jnp.float32), axis=-1)  # (B, S)
    if int8kv:
        s = s * ks                                      # dequant logits
    if use_alibi:
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        # slope arrives as this head's (1, 1, 1) block — a dynamic lane
        # extract (slopes[0, h]) cannot be proven 128-aligned by Mosaic
        s = s + slope_ref[0] * (k_pos - (kv_len - 1)).astype(jnp.float32)
    valid = mask_ref[...] > 0
    s = jnp.where(valid, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.where(valid, jnp.exp(s - m), 0.0)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)          # all-masked -> 0
    pw = p / denom
    if int8kv:
        pw = pw * vs                                    # dequant values
    a = jnp.sum(pw[..., None] * v.astype(jnp.float32), axis=1)

    wmat = wout_ref[0]
    mm_dtype = y_ref.dtype if wmat.dtype in (jnp.int8, jnp.int4) else wmat.dtype
    acc_ref[...] += jax.lax.dot_general(
        a.astype(mm_dtype), wmat.astype(mm_dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (B, D)

    @pl.when(h == pl.num_programs(0) - 1)
    def _fin():
        y = acc_ref[...]
        if has_wscale:
            # per-out-column scale is head-independent -> commutes with
            # the head accumulation
            y = y * ws_ref[0].astype(jnp.float32)
        if has_bias:
            y = y + bias_ref[0].astype(jnp.float32)
        if has_gate:
            y = y * jnp.tanh(gate_ref[...].astype(jnp.float32))
        if has_residual:
            y = y + res_ref[...].astype(jnp.float32)
        y_ref[...] = y.astype(y_ref.dtype)


def attend_out_decode(
    q: jax.Array,            # (B, H, Dh) — unscaled queries
    k_cache: jax.Array,      # (B, H, S, Dh)
    v_cache: jax.Array,
    mask: jax.Array,         # (B, S) validity (pad or media-time rule)
    wout: jax.Array,         # (H, Dh, D) out projection, head-sliced
    *,
    scale: float,
    k_new: Optional[jax.Array] = None,   # (B, H, Dh): write at slot
    v_new: Optional[jax.Array] = None,
    slot=None,               # scalar int32 (required with k_new)
    slopes=None,             # static (H,) ALiBi slopes or None
    wout_scale: Optional[jax.Array] = None,  # (D,) int8 wout scales
    bias: Optional[jax.Array] = None,     # (D,) out-projection bias
    gate: Optional[jax.Array] = None,     # scalar: y *= tanh(gate)
    residual: Optional[jax.Array] = None,  # (B, D)
    layer_idx=None,          # scalar int32: stacked per-layer operands
    k_scale: Optional[jax.Array] = None,  # (B, H_kv, S) int8-cache scales
    v_scale: Optional[jax.Array] = None,
    block_s: int = 16,
    interpret: Optional[bool] = None,
):
    """One-launch attention tail. Returns y (B, D), or
    (y, k_cache', v_cache') when k_new/v_new are given — plus
    (k_scale', v_scale') when the cache is int8.

    GQA (llama num_kv_heads < num_heads): k/v caches and k_new/v_new
    carry H_kv heads; query head hh reads kv head hh // n_rep via the
    block index maps — no repeat_kv materialization, the grouped cache
    streams once per query-head group.

    int8 cache (k_scale/v_scale given): k/v caches are int8 with
    per-token scales; the kernel dequantizes in-register (logits and
    softmax weights scaled per key slot) and quantizes k_new/v_new
    in-kernel, writing value + scale at the slot.

    layer_idx (scan decode): wout/wout_scale/bias/gate carry a leading
    L axis; the block index maps select the layer via scalar prefetch
    (packed as [slot, layer]) — no dynamic-slice weight copies."""
    from .dense_stream import INTERPRET

    interpret = INTERPRET if interpret is None else interpret
    b, h, dh = q.shape
    # cache_stacked (scan decode): caches carry a leading layer axis
    # (L, B, H_kv, S, Dh); the kernel reads/writes only layer
    # `layer_idx`'s blocks — no per-layer slice copies.
    cache_stacked = k_cache.ndim == 5
    if cache_stacked:
        assert layer_idx is not None
    h_kv = k_cache.shape[1 + cache_stacked]
    assert h % h_kv == 0, (h, h_kv)
    n_rep = h // h_kv
    s_max = k_cache.shape[2 + cache_stacked]
    d = wout.shape[-1]
    update = k_new is not None
    stacked = layer_idx is not None
    int8kv = k_scale is not None
    block_s = _pick_block_s(s_max, block_s)

    if slopes is None:
        slopes2 = jnp.zeros((h, 1, 1), jnp.float32)
    else:
        slopes2 = jnp.asarray(slopes, jnp.float32).reshape(h, 1, 1)
    # prefetch scalars: [slot, layer] (layer unused when not stacked)
    slot1 = jnp.stack([
        jnp.asarray(0 if slot is None else slot, jnp.int32).reshape(()),
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32)
        .reshape(()),
    ])

    def sshape(shape):
        return (None, *shape) if stacked else shape

    def smap(f):
        if stacked:
            return lambda hh, slot: (slot[1], *f(hh))
        return lambda hh, slot: f(hh)

    operands = [
        # 4D (B, H, 1, Dh): keeps each head block's last two dims equal
        # to the full array dims (Mosaic tiling requirement)
        (q.astype(jnp.float32) * scale).astype(q.dtype)[:, :, None, :],
        k_cache, v_cache,
        mask.astype(jnp.int32), slopes2, wout,
    ]
    if cache_stacked:
        kv_spec = pl.BlockSpec(
            (None, b, 1, s_max, dh),
            lambda hh, slot: (slot[1], 0, hh // n_rep, 0, 0),
        )
    else:
        kv_spec = pl.BlockSpec(
            (b, 1, s_max, dh), lambda hh, slot: (0, hh // n_rep, 0, 0)
        )
    in_specs = [
        pl.BlockSpec((b, 1, 1, dh), lambda hh, slot: (0, hh, 0, 0)),
        kv_spec,
        kv_spec,
        pl.BlockSpec((b, s_max), lambda hh, slot: (0, 0)),
        pl.BlockSpec((1, 1, 1), lambda hh, slot: (hh, 0, 0)),
        pl.BlockSpec(sshape((1, dh, d)), smap(lambda hh: (hh, 0, 0))),
    ]
    if update:
        operands += [k_new[:, :, None, :], v_new[:, :, None, :]]
        in_specs += [
            pl.BlockSpec((b, 1, 1, dh),
                         lambda hh, slot: (0, hh // n_rep, 0, 0)),
            pl.BlockSpec((b, 1, 1, dh),
                         lambda hh, slot: (0, hh // n_rep, 0, 0)),
        ]
    if int8kv:
        # head-leading (H_kv, B, S) scale layout: full (B, S) planes in
        # the last two dims (Mosaic block-legal at any B/S)
        if cache_stacked:
            sc_spec = pl.BlockSpec(
                (None, 1, b, s_max),
                lambda hh, slot: (slot[1], hh // n_rep, 0, 0),
            )
        else:
            sc_spec = pl.BlockSpec(
                (1, b, s_max), lambda hh, slot: (hh // n_rep, 0, 0)
            )
        operands += [k_scale, v_scale]
        in_specs += [sc_spec, sc_spec]

    def vec(v, dim):
        v = jnp.asarray(v)
        return v.reshape(-1, 1, dim) if stacked else v.reshape(1, dim)

    if wout_scale is not None:
        operands.append(vec(wout_scale.astype(jnp.float32), d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda hh: (0, 0))))
    if bias is not None:
        operands.append(vec(bias, d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda hh: (0, 0))))
    if gate is not None:
        operands.append(
            jnp.asarray(gate, jnp.float32).reshape(-1, 1, 1)
            if stacked
            else jnp.asarray(gate, jnp.float32).reshape(1, 1)
        )
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda hh: (0, 0))))
    if residual is not None:
        operands.append(residual)
        in_specs.append(pl.BlockSpec((b, d), lambda hh, slot: (0, 0)))

    out_specs = [pl.BlockSpec((b, d), lambda hh, slot: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, d), q.dtype)]
    aliases = {}
    if update:
        # GQA: n_rep query heads revisit the same kv-head block; the
        # repeated writes are identical (benign)
        if cache_stacked:
            kv_out = pl.BlockSpec(
                (None, b, 1, block_s, dh),
                lambda hh, slot: (
                    slot[1], 0, hh // n_rep, slot[0] // block_s, 0
                ),
            )
        else:
            kv_out = pl.BlockSpec(
                (b, 1, block_s, dh),
                lambda hh, slot: (0, hh // n_rep, slot[0] // block_s, 0),
            )
        out_specs += [kv_out, kv_out]
        out_shape += [
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ]
        # positional: (slot, q, k, v, mask, slopes, wout, k_new, v_new...)
        aliases = {2: 1, 3: 2}
        if int8kv:
            out_specs += [sc_spec, sc_spec]   # full-plane scale write
            out_shape += [
                jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
            ]
            # ks/vs operands sit after k_new/v_new (args 9, 10)
            aliases = {2: 1, 3: 2, 9: 3, 10: 4}

    kernel = functools.partial(
        _attend_out_kernel,
        kv_len=s_max, block_s=block_s,
        use_alibi=slopes is not None, update=update,
        has_bias=bias is not None,
        has_gate=gate is not None, has_residual=residual is not None,
        has_wscale=wout_scale is not None, int8kv=int8kv,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(slot1, *operands)
    if update and int8kv:
        return res[0], res[1], res[2], res[3], res[4]
    if update:
        return res[0], res[1], res[2]
    return res[0]


def _attn_block_kernel(
    slot_ref,       # (1,) int32 scalar prefetch
    x_ref,          # (B, D)
    wq_ref,         # (D, G*Dh) — this group's q columns
    *rest,
    group, head_dim, kv_len, block_s, eps, clip, scale, use_alibi,
    proj_kv, has_ln_bias, has_gate, has_wqs, has_wouts, int8kv,
    has_side=False, has_side_ln=False, has_side_ln_bias=False,
    side_act=None, has_side_b=False, has_side_res=False,
    side_eps=1e-5, has_side_ws=False,
):
    from .dense_stream import side_tile_compute, unpack_side_refs

    i = 0
    wk_ref = wv_ref = None
    if proj_kv:
        wk_ref, wv_ref = rest[i], rest[i + 1]
        i += 2
    k_ref, v_ref = rest[i], rest[i + 1]      # (B, G, S, Dh)
    mask_ref = rest[i + 2]                   # (B, S)
    slope_ref = rest[i + 3]                  # (G, 1, 1) this group's slopes
    wout_ref = rest[i + 4]                   # (G*Dh, D)
    ln_s_ref = rest[i + 5]
    i += 6
    ks_ref = vs_ref = None
    if int8kv:
        ks_ref, vs_ref = rest[i], rest[i + 1]   # (B, G, S) f32 scales
        i += 2
    wqs_ref = wks_ref = wvs_ref = wouts_ref = None
    if has_wqs:
        wqs_ref = rest[i]
        i += 1
        if proj_kv:
            wks_ref, wvs_ref = rest[i], rest[i + 1]
            i += 2
    if has_wouts:
        wouts_ref = rest[i]
        i += 1
    ln_b_ref = rest[i] if has_ln_bias else None
    i += has_ln_bias
    gate_ref = rest[i] if has_gate else None
    i += has_gate
    side_refs, i = unpack_side_refs(
        rest, i, has_side=has_side, has_side_ws=has_side_ws,
        has_side_ln=has_side_ln, has_side_ln_bias=has_side_ln_bias,
        has_side_b=has_side_b, has_side_res=has_side_res,
    )
    y_ref = rest[i]
    i += 1
    if proj_kv:
        ko_ref, vo_ref = rest[i], rest[i + 1]   # (B, G, BS, Dh)
        i += 2
        if int8kv:
            kso_ref, vso_ref = rest[i], rest[i + 1]   # (B, G, BS)
            i += 2
    so_ref = rest[i] if has_side else None
    i += has_side
    acc_ref = rest[i]

    g = pl.program_id(0)

    if has_side:
        # absorbed-ViT side tile rides this head group's KV+weight DMA
        # window (same primitive as the fused_mlp carrier — the attn
        # launches stream the whole KV cache, so their per-grid-step
        # windows are the largest in the int4/int8 decode loop)
        side_tile_compute(
            side_refs, so_ref, side_act=side_act, side_eps=side_eps,
            has_side_ln=has_side_ln, has_side_ws=has_side_ws,
            has_side_b=has_side_b, has_side_res=has_side_res,
        )

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    )
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * ln_s_ref[0].astype(jnp.float32)
    if has_ln_bias:
        h = h + ln_b_ref[0].astype(jnp.float32)
    hd = h.astype(x.dtype)

    def proj(w_ref, ws_ref=None):
        w = w_ref[...]
        if w.dtype in (jnp.int8, jnp.int4):
            # int8 weight streaming: exact int8 -> bf16 convert, the
            # per-out-channel scale restores magnitude BEFORE clip_qkv
            w = w.astype(x.dtype)
        y = jax.lax.dot_general(
            hd, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if ws_ref is not None:
            y = y * ws_ref[0].astype(jnp.float32)
        if clip is not None:
            y = jnp.clip(y, -clip, clip)
        return y                                  # (B, G*Dh) f32

    qg = proj(wq_ref, wqs_ref)
    if proj_kv:
        kg = proj(wk_ref, wks_ref)
        vg = proj(wv_ref, wvs_ref)

    slot = slot_ref[0]
    dh = head_dim
    for hh in range(group):
        sl = slice(hh * dh, (hh + 1) * dh)
        q_i = qg[:, sl] * scale                   # (B, Dh) f32
        k_i = k_ref[:, hh]                        # (B, S, Dh)
        v_i = v_ref[:, hh]
        if int8kv:
            ks_i = ks_ref[hh]                     # (B, S) f32
            vs_i = vs_ref[hh]
        if proj_kv:
            # the (B, Dh) -> (B, 1, Dh) expansion stays f32: Mosaic
            # cannot materialize a bf16 (B, 1, Dh) vector below 16
            # sublanes (bf16 packing), but the f32 form lowers at any
            # B; cast to the cache dtype only at the full-block store
            kn = kg[:, sl][:, None, :]               # (B, 1, Dh) f32
            vn = vg[:, sl][:, None, :]
            blk = slot // block_s
            off = slot - blk * block_s
            in_blk = (
                jax.lax.broadcasted_iota(jnp.int32, (1, block_s, 1), 1)
                == off
            )
            if int8kv:
                # quantize the new token in-kernel; attend to the
                # quantized value (what later steps read back)
                k_amax = jnp.max(jnp.abs(kn), axis=-1, keepdims=True)
                v_amax = jnp.max(jnp.abs(vn), axis=-1, keepdims=True)
                s_kn = jnp.where(k_amax == 0.0, 1.0, k_amax / 127.0)
                s_vn = jnp.where(v_amax == 0.0, 1.0, v_amax / 127.0)
                kn = jnp.clip(jnp.round(kn / s_kn), -127, 127)
                vn = jnp.clip(jnp.round(vn / s_vn), -127, 127)
                at_slot2 = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, kv_len), 1)
                    == slot
                )
                ks_i = jnp.where(at_slot2, s_kn[:, :, 0], ks_i)
                vs_i = jnp.where(at_slot2, s_vn[:, :, 0], vs_i)
                # scale planes are tiny: full-plane overlaid write
                kso_ref[hh] = ks_i
                vso_ref[hh] = vs_i
            k_blk = k_ref[:, hh, pl.ds(blk * block_s, block_s), :]
            v_blk = v_ref[:, hh, pl.ds(blk * block_s, block_s), :]
            ko_ref[:, hh] = jnp.where(
                in_blk, kn, k_blk.astype(jnp.float32)
            ).astype(ko_ref.dtype)
            vo_ref[:, hh] = jnp.where(
                in_blk, vn, v_blk.astype(jnp.float32)
            ).astype(vo_ref.dtype)
            at_slot = (
                jax.lax.broadcasted_iota(jnp.int32, (1, kv_len, 1), 1)
                == slot
            )
            k_i = jnp.where(at_slot, kn, k_i.astype(jnp.float32))
            v_i = jnp.where(at_slot, vn, v_i.astype(jnp.float32))

        s = jnp.sum(q_i[:, None, :] * k_i.astype(jnp.float32), axis=-1)
        if int8kv:
            s = s * ks_i                             # dequant logits
        if use_alibi:
            k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = s + slope_ref[hh] * (
                k_pos - (kv_len - 1)
            ).astype(jnp.float32)
        valid = mask_ref[...] > 0
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.where(valid, jnp.exp(s - m), 0.0)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        denom = jnp.where(denom == 0.0, 1.0, denom)   # all-masked -> 0
        pw = p / denom
        if int8kv:
            pw = pw * vs_i                           # dequant values
        a = jnp.sum(pw[..., None] * v_i.astype(jnp.float32), axis=1)
        wo = wout_ref[sl, :]
        if wo.dtype in (jnp.int8, jnp.int4):
            wo = wo.astype(x.dtype)
        acc_ref[...] += jax.lax.dot_general(
            a.astype(x.dtype), wo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(g == pl.num_programs(0) - 1)
    def _fin():
        y = acc_ref[...]
        if has_wouts:
            # per-out-column scale commutes with the group accumulation
            y = y * wouts_ref[0].astype(jnp.float32)
        if has_gate:
            y = y * jnp.tanh(gate_ref[...].astype(jnp.float32))
        y_ref[...] = (y + xf).astype(y_ref.dtype)


def attn_block_decode(
    x: jax.Array,            # (B, D)
    ln_scale: jax.Array,
    ln_bias: Optional[jax.Array],
    wq: jax.Array,           # (D, H*Dh), or the fused (D, 3*H*Dh) Wqkv
    wout: jax.Array,         # (H*Dh, D)
    k_cache: jax.Array,      # (B, H, S, Dh)
    v_cache: jax.Array,
    mask: jax.Array,         # (B, S)
    *,
    heads: int,
    head_dim: int,
    scale: float,
    fused_qkv: bool = False,  # wq is Wqkv [q|k|v]: project + write cache
    slot=None,                # required with fused_qkv
    slopes=None,
    clip: Optional[float] = None,
    gate: Optional[jax.Array] = None,
    wq_scale: Optional[jax.Array] = None,   # (3*H*Dh,) / (H*Dh,) int8
    wout_scale: Optional[jax.Array] = None,  # (D,) int8 wout scales
    layer_idx=None,          # scalar int32: stacked per-layer operands
    k_scale: Optional[jax.Array] = None,  # (B, H, S) int8-cache scales
    v_scale: Optional[jax.Array] = None,
    eps: float = 1e-5,
    head_block: Optional[int] = None,
    block_s: int = 16,
    side_x: Optional[jax.Array] = None,        # (SM, SK) streamed tile
    side_w: Optional[jax.Array] = None,        # (SK, SN) weight
    side_w_scale: Optional[jax.Array] = None,  # (SN,) int8 side_w scales
    side_ln: Optional[tuple] = None,           # (scale(SK,), bias|None)
    side_eps: float = 1e-5,
    side_act: Optional[str] = None,
    side_b: Optional[jax.Array] = None,
    side_residual: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
):
    """Whole attention half of a decode layer in ONE launch, grid over
    head groups: LN + q[/k/v] projection (weight column blocks — the
    fused Wqkv is indexed in place, never transposed) + cache write +
    masked attend (+ALiBi) + out-projection accumulate (+tanh gate) +
    residual. Returns y or (y, k_cache', v_cache') with fused_qkv —
    plus (k_scale', v_scale') when the cache is int8 (k_scale given).

    layer_idx (scan decode): wq/wout/ln/scales/gate carry a leading L
    axis, block-indexed via scalar prefetch [slot, layer].

    side_x/side_w: optional absorbed-ViT side tile (same API/semantics
    as fused_mlp's) — the attention launches stream the whole KV cache,
    so their per-grid-step DMA windows are the LARGEST in a quantized
    decode loop; a side tile rides each head group's window. With a
    side tile the return gains side_out as the last element."""
    from .dense_stream import INTERPRET

    interpret = INTERPRET if interpret is None else interpret
    b, d = x.shape
    h, dh = heads, head_dim
    cache_stacked = k_cache.ndim == 5
    if cache_stacked:
        assert layer_idx is not None
    s_max = k_cache.shape[2 + cache_stacked]
    stacked = layer_idx is not None
    int8kv = k_scale is not None
    if head_block is None:
        head_block = HEAD_BLOCK if stacked else HEAD_BLOCK_UNROLLED
    g = head_block
    while h % g:
        g //= 2
    n_groups = h // g
    gdh = g * dh
    block_s = _pick_block_s(s_max, block_s)
    inner = h * dh

    if slopes is None:
        slopes3 = jnp.zeros((h, 1, 1), jnp.float32)
    else:
        slopes3 = jnp.asarray(slopes, jnp.float32).reshape(h, 1, 1)
    slot1 = jnp.stack([
        jnp.asarray(0 if slot is None else slot, jnp.int32).reshape(()),
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32)
        .reshape(()),
    ])

    def sshape(shape):
        return (None, *shape) if stacked else shape

    def smap(f):
        if stacked:
            return lambda gg, slot: (slot[1], *f(gg))
        return lambda gg, slot: f(gg)

    def vec(v, dim):
        v = jnp.asarray(v)
        return v.reshape(-1, 1, dim) if stacked else v.reshape(1, dim)

    operands = [x, wq]
    in_specs = [
        pl.BlockSpec((b, d), lambda gg, slot: (0, 0)),
        pl.BlockSpec(sshape((d, gdh)), smap(lambda gg: (0, gg))),
    ]
    if fused_qkv:
        # same Wqkv array, shifted column-block index maps for k and v
        operands += [wq, wq]
        in_specs += [
            pl.BlockSpec(sshape((d, gdh)),
                         smap(lambda gg: (0, n_groups + gg))),
            pl.BlockSpec(sshape((d, gdh)),
                         smap(lambda gg: (0, 2 * n_groups + gg))),
        ]
    if cache_stacked:
        kv_spec = pl.BlockSpec(
            (None, b, g, s_max, dh),
            lambda gg, slot: (slot[1], 0, gg, 0, 0),
        )
    else:
        kv_spec = pl.BlockSpec(
            (b, g, s_max, dh), lambda gg, slot: (0, gg, 0, 0)
        )
    operands += [k_cache, v_cache, mask.astype(jnp.int32), slopes3, wout,
                 vec(ln_scale, d)]
    in_specs += [
        kv_spec,
        kv_spec,
        pl.BlockSpec((b, s_max), lambda gg, slot: (0, 0)),
        pl.BlockSpec((g, 1, 1), lambda gg, slot: (gg, 0, 0)),
        pl.BlockSpec(sshape((gdh, d)), smap(lambda gg: (gg, 0))),
        pl.BlockSpec(sshape((1, d)), smap(lambda gg: (0, 0))),
    ]
    if int8kv:
        # head-leading (H, B, S) scales: per-group leading slice, full
        # (B, S) planes in the last two dims (Mosaic block-legal)
        if cache_stacked:
            sc_spec = pl.BlockSpec(
                (None, g, b, s_max), lambda gg, slot: (slot[1], gg, 0, 0)
            )
        else:
            sc_spec = pl.BlockSpec(
                (g, b, s_max), lambda gg, slot: (gg, 0, 0)
            )
        operands += [k_scale, v_scale]
        in_specs += [sc_spec, sc_spec]
    if wq_scale is not None:
        ws = jnp.asarray(wq_scale, jnp.float32)
        ws = ws.reshape(-1, 1, ws.shape[-1]) if stacked else ws.reshape(1, -1)
        operands.append(ws)
        in_specs.append(
            pl.BlockSpec(sshape((1, gdh)), smap(lambda gg: (0, gg)))
        )
        if fused_qkv:
            operands += [ws, ws]
            in_specs += [
                pl.BlockSpec(sshape((1, gdh)),
                             smap(lambda gg: (0, n_groups + gg))),
                pl.BlockSpec(sshape((1, gdh)),
                             smap(lambda gg: (0, 2 * n_groups + gg))),
            ]
    if wout_scale is not None:
        operands.append(vec(wout_scale.astype(jnp.float32), d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda gg: (0, 0))))
    has_ln_bias = ln_bias is not None
    if has_ln_bias:
        operands.append(vec(ln_bias, d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda gg: (0, 0))))
    if gate is not None:
        operands.append(
            jnp.asarray(gate, jnp.float32).reshape(-1, 1, 1)
            if stacked
            else jnp.asarray(gate, jnp.float32).reshape(1, 1)
        )
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda gg: (0, 0))))
    has_side = side_x is not None
    if has_side:
        from .dense_stream import append_side_operands

        smb, sn = append_side_operands(
            operands, in_specs, side_x=side_x, side_w=side_w,
            side_w_scale=side_w_scale, side_ln=side_ln, side_b=side_b,
            side_residual=side_residual, grid_n=n_groups,
            umap=lambda f: (lambda gg, slot: f(gg)),
        )

    out_specs = [pl.BlockSpec((b, d), lambda gg, slot: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, d), x.dtype)]
    aliases = {}
    if fused_qkv:
        if cache_stacked:
            kv_out = pl.BlockSpec(
                (None, b, g, block_s, dh),
                lambda gg, slot: (slot[1], 0, gg, slot[0] // block_s, 0),
            )
        else:
            kv_out = pl.BlockSpec(
                (b, g, block_s, dh),
                lambda gg, slot: (0, gg, slot[0] // block_s, 0),
            )
        out_specs += [kv_out, kv_out]
        out_shape += [
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ]
        # positional: (slot=0, x=1, wq=2, wk=3, wv=4, k=5, v=6, ...)
        aliases = {5: 1, 6: 2}
        if int8kv:
            out_specs += [sc_spec, sc_spec]   # full-plane scale write
            out_shape += [
                jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
                jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
            ]
            # ks/vs operands sit after ln_scale (args 11, 12)
            aliases = {5: 1, 6: 2, 11: 3, 12: 4}
    if has_side:
        # side_out is the LAST output so the alias indices stay fixed
        out_specs.append(
            pl.BlockSpec((smb, sn), lambda gg, slot: (gg, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((side_x.shape[0], sn), side_x.dtype)
        )

    from .dense_stream import side_kernel_flags

    kernel = functools.partial(
        _attn_block_kernel,
        group=g, head_dim=dh, kv_len=s_max, block_s=block_s, eps=eps,
        clip=clip, scale=scale, use_alibi=slopes is not None,
        proj_kv=fused_qkv, has_ln_bias=has_ln_bias,
        has_gate=gate is not None,
        has_wqs=wq_scale is not None,
        has_wouts=wout_scale is not None,
        int8kv=int8kv,
        **side_kernel_flags(
            side_x=side_x, side_w_scale=side_w_scale, side_ln=side_ln,
            side_act=side_act, side_b=side_b,
            side_residual=side_residual, side_eps=side_eps,
        ),
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(slot1, *operands)
    n_main = 1 + (2 + 2 * int8kv if fused_qkv else 0)
    main = tuple(res[:n_main])
    if has_side:
        return (*main, res[n_main])
    return main if fused_qkv else main[0]


def reference_attend_out(
    q, k, v, mask, wout, *, scale, k_new=None, v_new=None, slot=None,
    slopes=None, wout_scale=None, bias=None, gate=None, residual=None,
    k_scale=None, v_scale=None,
):
    """jnp semantics mirror (parity tests). wout: (H, Dh, D). GQA:
    k/v may carry H_kv = H / n_rep heads. int8 cache: k/v int8 with
    per-token scales in the head-leading (H_kv, B, S) layout — mirrors
    the kernel's in-register dequant and the in-kernel quantization of
    the new token."""
    if wout.dtype in (jnp.int8, jnp.int4):
        wout = wout.astype(q.dtype)
    b, h, dh = q.shape
    s_max = k.shape[2]
    int8kv = k_scale is not None
    if int8kv:
        from ..models.decoders.common import kv_scale_layout, quantize_kv

        if k_new is not None:
            kn_q, kn_s = quantize_kv(k_new)     # scale (B, H_kv)
            vn_q, vn_s = quantize_kv(v_new)
            k = k.at[:, :, slot].set(kn_q)
            v = v.at[:, :, slot].set(vn_q)
            k_scale = k_scale.at[:, :, slot].set(kn_s.T)
            v_scale = v_scale.at[:, :, slot].set(vn_s.T)
        kv_out = (k, v, k_scale, v_scale)
        k = k.astype(jnp.float32) * kv_scale_layout(k_scale)[..., None]
        v = v.astype(jnp.float32) * kv_scale_layout(v_scale)[..., None]
        out = _reference_attend_core(
            q, k, v, mask, wout, scale=scale, slopes=slopes,
            wout_scale=wout_scale, bias=bias, gate=gate, residual=residual,
            s_max=s_max,
        )
        if k_new is not None:
            return (out, *kv_out)
        return out
    if k_new is not None:
        k = k.at[:, :, slot].set(k_new.astype(k.dtype))
        v = v.at[:, :, slot].set(v_new.astype(v.dtype))
    kv_out = (k, v)
    out = _reference_attend_core(
        q, k, v, mask, wout, scale=scale, slopes=slopes,
        wout_scale=wout_scale, bias=bias, gate=gate, residual=residual,
        s_max=s_max,
    )
    if k_new is not None:
        return out, kv_out[0], kv_out[1]
    return out


def _reference_attend_core(
    q, k, v, mask, wout, *, scale, slopes, wout_scale, bias, gate,
    residual, s_max,
):
    h = q.shape[1]
    n_rep = h // k.shape[1]
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=1)
        v = jnp.repeat(v, n_rep, axis=1)
    logits = jnp.einsum(
        "bhd,bhsd->bhs", q.astype(jnp.float32) * scale,
        k.astype(jnp.float32),
    )
    if slopes is not None:
        pos = jnp.arange(s_max, dtype=jnp.float32) - (s_max - 1)
        logits = logits + jnp.asarray(slopes, jnp.float32)[None, :, None] * pos
    mb = mask.astype(bool)[:, None, :]
    logits = jnp.where(mb, logits, NEG_INF)
    m = logits.max(-1, keepdims=True)
    p = jnp.where(mb, jnp.exp(logits - m), 0.0)
    denom = p.sum(-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    a = jnp.einsum("bhs,bhsd->bhd", p / denom, v.astype(jnp.float32))
    # wout is pre-cast by reference_attend_out (the sole caller)
    y = jnp.einsum("bhd,hdo->bo", a.astype(wout.dtype), wout)
    if wout_scale is not None:
        y = y * wout_scale.astype(y.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if gate is not None:
        y = y * jnp.tanh(jnp.asarray(gate, jnp.float32)).reshape(())
    if residual is not None:
        y = y + residual.astype(y.dtype)
    return y.astype(q.dtype)
