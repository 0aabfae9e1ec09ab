"""Whole-decode-layer kernel: attention half + MLP half in ONE launch.

At B<=64 every Pallas launch costs a fixed ~15-25 us of dispatch and
pipeline ramp; an OF-3B decode step (24 MPT blocks + 24 gated-xattn
blocks + logits) runs ~97 launches = 1.5-2 ms of its ~6.4 ms device
time. This kernel fuses each block's two launches into one by phasing a
single grid:

    grid = (n_head_groups + n_k2_blocks,)
    phase A (p < n_groups):   LN1 + q[/k/v] projection + cache write +
                              masked attend (+ALiBi) + out-proj
                              accumulate — identical math to
                              decode_layer._attn_block_kernel;
                              at the last group, x2 = residual + attn
                              (optionally * tanh(gate)) lands in a VMEM
                              scratch that persists across the grid.
    phase B (p >= n_groups):  ki = p - n_groups: LN2(x2) (recomputed per
                              step — (B, D) is tiny) + W1 block matmul +
                              act (+SwiGLU) + W2 block accumulate;
                              last step writes y = x2 + MLP (*gate2).

Index maps CLAMP into their phase (attn operands freeze at the last
group during phase B and vice versa) so every block is fetched exactly
once — Mosaic only refetches on index change — and W1/W2 block 0
prefetches during the last attention group, so the phase boundary
costs nothing.

Used for the MPT family (fused Wqkv, ALiBi, optional clip) and the
gated cross-attention block (static media K/V, tanh gates) — the OF-3B
flagship path; rotary families keep the 3-launch split (RoPE sits
between projection and attend). Supports int8 weight streaming
(per-out-channel scales), GQA-free MHA only, and the stacked-weight /
stacked-cache scan layout via a [slot, layer] scalar prefetch.

Replaced torch path: HF per-layer decode modules driven by
open_flamingo/src/flamingo.py:124-175 generate().
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_layer import _pick_block_s

NEG_INF = -1.0e30

# Default OFF: the on-TPU A/B (scripts_dev/tpu_fused_layer_ab.py, r3)
# measured the single-launch layer ~3% SLOWER than the two-launch
# composition at B=32 (3,409 vs 3,507 tok/s scan-int8) and noise-equal
# at B=8 — decode is DMA-bound, not launch-bound, and the phased grid
# costs a little pipelining overlap at the phase boundary. Kept as
# tested library code (tests/test_fused_layer.py) behind this hook.
DISABLE = True

# Round-5 second look (VERDICT r4 #7): the round-3 A/B merged BOTH the
# decoder layer AND the gated-xattn layer. The decoder merge is what
# lost (two big streams + phase boundary); the xattn ATTENTION TAIL is
# a different case — a ~10MB launch running at ~260GB/s (decode-trace),
# i.e. mostly per-launch fixed cost, which folding into the 67MB ff
# stream amortizes. XATTN_ONLY enables the single-launch path for the
# gated-xattn layer alone, decoder blocks stay two-launch.
XATTN_ONLY = False


def use_for_xattn() -> bool:
    return XATTN_ONLY or not DISABLE


def _act_f32(h, act):
    from .dense_stream import _act_f32 as impl

    return impl(h, act)


def _norm_f32(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    )
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * scale[0].astype(jnp.float32)
    if bias is not None:
        h = h + bias[0].astype(jnp.float32)
    return h


def _layer_kernel(
    slot_ref,        # (2,) int32 prefetch: [slot, layer]
    x_ref,           # (B, D)
    wq_ref,          # attn q columns for group ga
    *rest,
    n_groups, group, head_dim, kv_len, block_s, eps, clip, scale,
    use_alibi, proj_kv, has_ln1_bias, has_ln2_bias, has_gate,
    has_gate2, has_wqs, has_wouts, has_w1s, has_w2s, has_w1b, has_w1bs,
    has_b1, has_b2, act, k2_total, block_k2,
):
    i = 0
    wk_ref = wv_ref = None
    if proj_kv:
        wk_ref, wv_ref = rest[i], rest[i + 1]
        i += 2
    k_ref, v_ref = rest[i], rest[i + 1]
    mask_ref = rest[i + 2]
    slope_ref = rest[i + 3]
    wout_ref = rest[i + 4]
    ln1_s_ref = rest[i + 5]
    i += 6
    ln1_b_ref = rest[i] if has_ln1_bias else None
    i += has_ln1_bias
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
    gate_ref = rest[i] if has_gate else None
    i += has_gate
    # --- MLP operands ---
    w1_ref, w2_ref = rest[i], rest[i + 1]
    i += 2
    w1b_ref = rest[i] if has_w1b else None
    i += has_w1b
    ln2_s_ref = rest[i]
    i += 1
    ln2_b_ref = rest[i] if has_ln2_bias else None
    i += has_ln2_bias
    w1s_ref = rest[i] if has_w1s else None
    i += has_w1s
    w2s_ref = rest[i] if has_w2s else None
    i += has_w2s
    w1bs_ref = rest[i] if has_w1bs else None
    i += has_w1bs
    b1_ref = rest[i] if has_b1 else None
    i += has_b1
    b2_ref = rest[i] if has_b2 else None
    i += has_b2
    gate2_ref = rest[i] if has_gate2 else None
    i += has_gate2
    y_ref = rest[i]
    i += 1
    if proj_kv:
        ko_ref, vo_ref = rest[i], rest[i + 1]
        i += 2
    acc_ref, x2_ref, acc2_ref = rest[i], rest[i + 1], rest[i + 2]

    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def cast_w(w):
        return w.astype(x_ref.dtype) if w.dtype in (jnp.int8, jnp.int4) else w

    # ---------------- phase A: attention (p < n_groups) ----------------
    @pl.when(p < n_groups)
    def _attn():
        x = x_ref[...]
        h = _norm_f32(x, ln1_s_ref, ln1_b_ref, eps)
        hd = h.astype(x.dtype)

        def proj(w_ref, ws_ref):
            y = jax.lax.dot_general(
                hd, cast_w(w_ref[...]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if ws_ref is not None:
                y = y * ws_ref[0].astype(jnp.float32)
            if clip is not None:
                y = jnp.clip(y, -clip, clip)
            return y

        qg = proj(wq_ref, wqs_ref)
        if proj_kv:
            kg = proj(wk_ref, wks_ref)
            vg = proj(wv_ref, wvs_ref)

        slot = slot_ref[0]
        dh = head_dim
        for hh in range(group):
            sl = slice(hh * dh, (hh + 1) * dh)
            q_i = qg[:, sl] * scale
            k_i = k_ref[:, hh]
            v_i = v_ref[:, hh]
            if proj_kv:
                # the (B, Dh) -> (B, 1, Dh) expansion stays f32: Mosaic
                # cannot materialize a bf16 (B, 1, Dh) vector below 16
                # sublanes (bf16 packing), but the f32 form lowers at
                # any B; cast to the cache dtype only at the full-block
                # store
                kn = kg[:, sl][:, None, :]            # (B, 1, Dh) f32
                vn = vg[:, sl][:, None, :]
                blk = slot // block_s
                off = slot - blk * block_s
                in_blk = (
                    jax.lax.broadcasted_iota(jnp.int32, (1, block_s, 1), 1)
                    == off
                )
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
            if use_alibi:
                k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = s + slope_ref[hh] * (
                    k_pos - (kv_len - 1)
                ).astype(jnp.float32)
            valid = mask_ref[...] > 0
            s = jnp.where(valid, s, NEG_INF)
            mx = jnp.max(s, axis=-1, keepdims=True)
            pr = jnp.where(valid, jnp.exp(s - mx), 0.0)
            denom = jnp.sum(pr, axis=-1, keepdims=True)
            denom = jnp.where(denom == 0.0, 1.0, denom)
            a = jnp.sum(
                (pr / denom)[..., None] * v_i.astype(jnp.float32), axis=1
            )
            acc_ref[...] += jax.lax.dot_general(
                a.astype(x.dtype), cast_w(wout_ref[...])[sl, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(p == n_groups - 1)
        def _fin_attn():
            y = acc_ref[...]
            if has_wouts:
                y = y * wouts_ref[0].astype(jnp.float32)
            if has_gate:
                y = y * jnp.tanh(gate_ref[...].astype(jnp.float32))
            x2_ref[...] = y + x.astype(jnp.float32)
            acc2_ref[...] = jnp.zeros_like(acc2_ref)

    # ---------------- phase B: MLP (p >= n_groups) ---------------------
    @pl.when(p >= n_groups)
    def _mlp():
        ki = p - n_groups
        x2 = x2_ref[...]
        h = _norm_f32(x2, ln2_s_ref, ln2_b_ref, eps)
        hd = h.astype(x_ref.dtype)
        u = jax.lax.dot_general(
            hd, cast_w(w1_ref[...]), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_w1s:
            u = u * w1s_ref[0].astype(jnp.float32)
        if has_b1:
            u = u + b1_ref[0].astype(jnp.float32)
        u = _act_f32(u, act)
        if has_w1b:
            u2 = jax.lax.dot_general(
                hd, cast_w(w1b_ref[...]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_w1bs:
                u2 = u2 * w1bs_ref[0].astype(jnp.float32)
            u = u * u2
        w2b = cast_w(w2_ref[...])
        if k2_total % block_k2 != 0:
            lane = ki * block_k2 + jax.lax.broadcasted_iota(
                jnp.int32, u.shape, 1
            )
            u = jnp.where(lane < k2_total, u, 0.0)
            row = ki * block_k2 + jax.lax.broadcasted_iota(
                jnp.int32, w2b.shape, 0
            )
            w2b = jnp.where(row < k2_total, w2b, jnp.zeros_like(w2b))
        acc2_ref[...] += jax.lax.dot_general(
            u.astype(x_ref.dtype), w2b,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(p == pl.num_programs(0) - 1)
        def _fin():
            y = acc2_ref[...]
            if has_w2s:
                y = y * w2s_ref[0].astype(jnp.float32)
            if has_b2:
                y = y + b2_ref[0].astype(jnp.float32)
            if has_gate2:
                y = y * jnp.tanh(gate2_ref[...].astype(jnp.float32))
            y_ref[...] = (y + x2_ref[...]).astype(y_ref.dtype)


def fused_layer_decode(
    x: jax.Array,            # (B, D)
    ln1_scale, ln1_bias,
    wq: jax.Array,           # (D, H*Dh) or fused (D, 3*H*Dh)
    wout: jax.Array,         # (H*Dh, D)
    k_cache, v_cache,        # (B, H, S, Dh) or stacked (L, B, H, S, Dh)
    mask,                    # (B, S)
    w1, w2,                  # MLP
    ln2_scale, ln2_bias,
    *,
    heads: int,
    head_dim: int,
    scale: float,
    act: str = "gelu",
    fused_qkv: bool = False,
    slot=None,
    slopes=None,
    clip: Optional[float] = None,
    gate=None,               # attn tanh gate (xattn)
    gate2=None,              # ff tanh gate (xattn)
    w1_gate=None,            # SwiGLU
    wq_scale=None, wout_scale=None,
    w1_scale=None, w2_scale=None, w1_gate_scale=None,
    b1=None, b2=None,
    layer_idx=None,
    eps: float = 1e-5,
    head_block: int = 8,
    block_s: int = 16,
    block_k2: int = 2048,
    interpret: Optional[bool] = None,
):
    """One launch for a whole decode layer (attention + MLP phases).
    Returns y (B, D), or (y, k_cache', v_cache') with fused_qkv."""
    from .dense_stream import INTERPRET

    interpret = INTERPRET if interpret is None else interpret
    b, d = x.shape
    h, dh = heads, head_dim
    cache_stacked = k_cache.ndim == 5
    if cache_stacked:
        assert layer_idx is not None
    s_max = k_cache.shape[2 + cache_stacked]
    stacked = layer_idx is not None
    g = head_block
    while h % g:
        g //= 2
    n_groups = h // g
    gdh = g * dh
    block_s = _pick_block_s(s_max, block_s)
    k2 = w1.shape[1 + stacked]
    k1 = w1.shape[0 + stacked]
    n_out = w2.shape[1 + stacked]
    block_k2 = min(block_k2, k2)
    n_k2 = pl.cdiv(k2, block_k2)
    grid = (n_groups + n_k2,)

    if slopes is None:
        slopes3 = jnp.zeros((h, 1, 1), jnp.float32)
    else:
        slopes3 = jnp.asarray(slopes, jnp.float32).reshape(h, 1, 1)
    slot1 = jnp.stack([
        jnp.asarray(0 if slot is None else slot, jnp.int32).reshape(()),
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32)
        .reshape(()),
    ])

    NG = n_groups

    def aclamp(p):
        # attention-phase group index, frozen at the last group in B
        return jnp.minimum(p, NG - 1)

    def mclamp(p):
        # MLP-phase k2 index, frozen at 0 during A
        return jnp.maximum(p - NG, 0)

    def sshape(shape):
        return (None, *shape) if stacked else shape

    def smap(f):
        if stacked:
            return lambda p, s: (s[1], *f(p))
        return lambda p, s: f(p)

    def umap(f):
        return lambda p, s: f(p)

    def vec(v, dim):
        v = jnp.asarray(v)
        return v.reshape(-1, 1, dim) if stacked else v.reshape(1, dim)

    def sc(v):
        v = jnp.asarray(v, jnp.float32)
        return v.reshape(-1, 1, 1) if stacked else v.reshape(1, 1)

    operands = [x, wq]
    in_specs = [
        pl.BlockSpec((b, d), umap(lambda p: (0, 0))),
        pl.BlockSpec(sshape((d, gdh)), smap(lambda p: (0, aclamp(p)))),
    ]
    if fused_qkv:
        operands += [wq, wq]
        in_specs += [
            pl.BlockSpec(sshape((d, gdh)),
                         smap(lambda p: (0, NG + aclamp(p)))),
            pl.BlockSpec(sshape((d, gdh)),
                         smap(lambda p: (0, 2 * NG + aclamp(p)))),
        ]
    if cache_stacked:
        kv_spec = pl.BlockSpec(
            (None, b, g, s_max, dh),
            lambda p, s: (s[1], 0, aclamp(p), 0, 0),
        )
    else:
        kv_spec = pl.BlockSpec(
            (b, g, s_max, dh), lambda p, s: (0, aclamp(p), 0, 0)
        )
    operands += [k_cache, v_cache, mask.astype(jnp.int32), slopes3, wout,
                 vec(ln1_scale, d)]
    in_specs += [
        kv_spec,
        kv_spec,
        pl.BlockSpec((b, s_max), umap(lambda p: (0, 0))),
        pl.BlockSpec((g, 1, 1), lambda p, s: (aclamp(p), 0, 0)),
        pl.BlockSpec(sshape((gdh, d)), smap(lambda p: (aclamp(p), 0))),
        pl.BlockSpec(sshape((1, d)), smap(lambda p: (0, 0))),
    ]
    if ln1_bias is not None:
        operands.append(vec(ln1_bias, d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda p: (0, 0))))
    if wq_scale is not None:
        ws = jnp.asarray(wq_scale, jnp.float32)
        ws = ws.reshape(-1, 1, ws.shape[-1]) if stacked else ws.reshape(1, -1)
        operands.append(ws)
        in_specs.append(
            pl.BlockSpec(sshape((1, gdh)), smap(lambda p: (0, aclamp(p))))
        )
        if fused_qkv:
            operands += [ws, ws]
            in_specs += [
                pl.BlockSpec(sshape((1, gdh)),
                             smap(lambda p: (0, NG + aclamp(p)))),
                pl.BlockSpec(sshape((1, gdh)),
                             smap(lambda p: (0, 2 * NG + aclamp(p)))),
            ]
    if wout_scale is not None:
        operands.append(vec(jnp.asarray(wout_scale, jnp.float32), d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda p: (0, 0))))
    if gate is not None:
        operands.append(sc(gate))
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda p: (0, 0))))
    # --- MLP operands ---
    operands += [w1, w2]
    in_specs += [
        pl.BlockSpec(sshape((k1, block_k2)), smap(lambda p: (0, mclamp(p)))),
        pl.BlockSpec(sshape((block_k2, n_out)),
                     smap(lambda p: (mclamp(p), 0))),
    ]
    if w1_gate is not None:
        operands.append(w1_gate)
        in_specs.append(
            pl.BlockSpec(sshape((k1, block_k2)),
                         smap(lambda p: (0, mclamp(p))))
        )
    operands.append(vec(ln2_scale, d))
    in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda p: (0, 0))))
    if ln2_bias is not None:
        operands.append(vec(ln2_bias, d))
        in_specs.append(pl.BlockSpec(sshape((1, d)), smap(lambda p: (0, 0))))
    if w1_scale is not None:
        operands.append(vec(w1_scale.astype(jnp.float32), k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)),
                         smap(lambda p: (0, mclamp(p))))
        )
    if w2_scale is not None:
        operands.append(vec(w2_scale.astype(jnp.float32), n_out))
        in_specs.append(pl.BlockSpec(sshape((1, n_out)),
                                     smap(lambda p: (0, 0))))
    if w1_gate_scale is not None:
        operands.append(vec(w1_gate_scale.astype(jnp.float32), k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)),
                         smap(lambda p: (0, mclamp(p))))
        )
    if b1 is not None:
        operands.append(vec(b1, k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)),
                         smap(lambda p: (0, mclamp(p))))
        )
    if b2 is not None:
        operands.append(vec(b2, n_out))
        in_specs.append(pl.BlockSpec(sshape((1, n_out)),
                                     smap(lambda p: (0, 0))))
    if gate2 is not None:
        operands.append(sc(gate2))
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda p: (0, 0))))

    out_specs = [pl.BlockSpec((b, d), umap(lambda p: (0, 0)))]
    out_shape = [jax.ShapeDtypeStruct((b, d), x.dtype)]
    aliases = {}
    if fused_qkv:
        if cache_stacked:
            kv_out = pl.BlockSpec(
                (None, b, g, block_s, dh),
                lambda p, s: (s[1], 0, aclamp(p), s[0] // block_s, 0),
            )
        else:
            kv_out = pl.BlockSpec(
                (b, g, block_s, dh),
                lambda p, s: (0, aclamp(p), s[0] // block_s, 0),
            )
        out_specs += [kv_out, kv_out]
        out_shape += [
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ]
        # positional: (slot, x=1, wq=2, wk=3, wv=4, k=5, v=6, ...)
        aliases = {5: 1, 6: 2}

    kernel = functools.partial(
        _layer_kernel,
        n_groups=n_groups, group=g, head_dim=dh, kv_len=s_max,
        block_s=block_s, eps=eps, clip=clip, scale=scale,
        use_alibi=slopes is not None, proj_kv=fused_qkv,
        has_ln1_bias=ln1_bias is not None,
        has_ln2_bias=ln2_bias is not None,
        has_gate=gate is not None, has_gate2=gate2 is not None,
        has_wqs=wq_scale is not None, has_wouts=wout_scale is not None,
        has_w1s=w1_scale is not None, has_w2s=w2_scale is not None,
        has_w1b=w1_gate is not None, has_w1bs=w1_gate_scale is not None,
        has_b1=b1 is not None, has_b2=b2 is not None,
        act=act, k2_total=k2, block_k2=block_k2,
    )
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((b, d), jnp.float32),   # attn out accumulator
                pltpu.VMEM((b, d), jnp.float32),   # x2 (post-attn resid)
                pltpu.VMEM((b, n_out), jnp.float32),  # mlp accumulator
            ],
        ),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(slot1, *operands)
    if fused_qkv:
        return res[0], res[1], res[2]
    return res[0]
