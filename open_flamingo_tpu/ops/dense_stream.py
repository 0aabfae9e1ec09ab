"""Fused streaming dense kernels for the single-token decode path.

Autoregressive decode is weight-DMA-bound: every generated token streams
every layer's weight matrices HBM->VMEM once, and the per-token compute
(a (B, K) x (K, N) mat-vec batch, B<=64) is negligible next to the DMA.
XLA's decode graph for one transformer layer is ~10 separate fusions
(LN stats, convert, matmul, clip, residual, ...), and its
memory-space-assignment pass streams the weights through latency-bound
chunked VMEM copies at well below HBM line rate (~440 GB/s of an
~819 GB/s v5e roofline, measured — see CLAUDE.md profile notes).

These kernels collapse a layer's decode step into two launches whose
weight blocks are pipelined by Mosaic's double-buffered block fetcher at
line rate, with every elementwise op (LayerNorm, bias, clip, activation,
gate, residual) fused in:

  * fused_dense:  y = epilogue(maybe_ln(x) @ W), grid over N blocks —
    covers QKV projections and attention output projections.
  * fused_mlp:    y = residual + gate * (act(maybe_ln(x) @ W1 + b1) @ W2
    + b2), grid over the hidden (K2) axis with an fp32 VMEM accumulator —
    the intermediate activation never touches HBM and BOTH weight
    matrices stream through one pipeline.

The replaced torch path: HF's per-layer decode modules driven by
open_flamingo/src/flamingo.py:124-175 generate().

All math is fp32 in-kernel (LN stats, matmul accumulation via
preferred_element_type, activation); outputs cast to the input dtype.
x is expected tiny ((B, K), B<=~64) and is re-read per grid step — the
redundant LN flops are irrelevant at this size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Test hooks: FORCE_FUSED routes the blocks' decode path through the
# fused kernels regardless of backend; DISABLE_FUSED forces the plain
# XLA path even on TPU (A/B debugging); INTERPRET runs the kernels in
# pallas interpret mode (CPU).
FORCE_FUSED = False
DISABLE_FUSED = False
INTERPRET = False

# Grid block-size defaults (overridable for on-TPU A/B sweeps via env,
# read once at import — scripts_dev/tpu_knob_ab.py). Block size trades
# per-block DMA-issue overhead against pipeline-fill exposure and VMEM.
# Round-4 sweep (BASELINE.md "decode grid-knob A/B"): SMALLER blocks
# win in the scan engine — the per-launch cost is dominated by the
# first block's exposed DMA (fill), not per-block issue overhead — and
# the best K2 block is dtype-dependent (a bf16 block is 2x the bytes
# of an int8 one, so bf16 wants half the block). New defaults apply to
# the STACKED (scan) path where they were measured; the legacy
# unrolled layout keeps the round-3 blocks (unmeasured there, and its
# ~25-min compiles stay cache-warm). B=32 scan generate: bf16
# 2,628 -> 2,844 tok/s, int4+W8A8 4,385 -> 4,635.
import os as _os

BLOCK_N = int(_os.environ.get("OFT_BLOCK_N", "1024"))
BLOCK_K2 = int(_os.environ.get("OFT_BLOCK_K2", "1024"))
BLOCK_K2_BF16 = int(
    _os.environ.get("OFT_BLOCK_K2_BF16",
                    _os.environ.get("OFT_BLOCK_K2", "512"))
)
# own env var (not OFT_BLOCK_K2): a sweep tuning the scan engine must
# not silently re-block the unrolled layout and cold its ~25-min compiles
BLOCK_K2_UNROLLED = int(_os.environ.get("OFT_BLOCK_K2_UNROLLED", "2048"))

# Model-axis tensor parallelism gate. The fused decode pallas_calls have
# no GSPMD partitioning rules: handing them model-axis-sharded weights
# makes XLA replicate (a full per-step weight all-gather) or fail to
# compile. flamingo_generate auto-detects this from concrete params;
# callers that jit around generate with sharded params must call
# note_params_sharding(params) once, outside jit.
_MODEL_SHARDED = False
_WARNED_SHARDED = False


def params_model_sharded(params) -> bool:
    """True if any param leaf is sharded along a >1-sized 'model' mesh
    axis. Tracer leaves (inside jit) carry no sharding and are skipped."""
    for leaf in jax.tree.leaves(params):
        if isinstance(leaf, jax.core.Tracer):
            continue
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        mesh = getattr(sharding, "mesh", None)
        if spec is None or mesh is None:
            continue
        axes = set()
        for entry in tuple(spec):
            if entry is None:
                continue
            axes.update(entry if isinstance(entry, tuple) else (entry,))
        if "model" in axes and dict(mesh.shape).get("model", 1) > 1:
            return True
    return False


def note_params_sharding(params) -> bool:
    """Record (OUTSIDE jit, with concrete placed params) whether the
    model's params are model-axis sharded; returns the new gate value."""
    global _MODEL_SHARDED
    _MODEL_SHARDED = params_model_sharded(params)
    return _MODEL_SHARDED


def fused_head_dim_ok(head_dim: int) -> bool:
    """Mosaic cannot lower the decode kernels' (B, Dh) -> (B, 1, Dh)
    shape casts below Dh=64 (found at Dh=32, round 3); every supported
    real checkpoint uses Dh in {64, 128}. Interpret mode (CPU tests,
    FORCE_FUSED) has no such limit."""
    return head_dim >= 64 or FORCE_FUSED or INTERPRET


def use_fused_decode(tq: int, cached: bool) -> bool:
    """Single-token decode against a cache on TPU -> fused kernels."""
    global _WARNED_SHARDED
    if _MODEL_SHARDED:
        if not _WARNED_SHARDED:
            import logging

            logging.getLogger(__name__).warning(
                "fused decode disabled: params are model-axis sharded "
                "(tensor parallel); falling back to the partitionable "
                "einsum decode path"
            )
            _WARNED_SHARDED = True
        return False
    if DISABLE_FUSED:
        return False
    if FORCE_FUSED:
        return tq == 1 and cached
    return tq == 1 and cached and jax.default_backend() == "tpu"


def _norm_f32(x, scale_ref, bias_ref, eps, kind="layer"):
    """fp32 normalization over the last axis. kind="layer": LayerNorm
    with flax fast-variance semantics (var = max(0, E[x^2] - E[x]^2));
    kind="rms": RMSNorm (HF Llama). scale/bias refs optional."""
    x = x.astype(jnp.float32)
    if kind == "rms":
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        h = x * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.maximum(
            0.0,
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu),
        )
        h = (x - mu) * jax.lax.rsqrt(var + eps)
    if scale_ref is not None:
        h = h * scale_ref[0].astype(jnp.float32)
    if bias_ref is not None:
        h = h + bias_ref[0].astype(jnp.float32)
    return h


def _erf_f32(x):
    """erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7, under
    fp32 matmul noise) — Mosaic has no erf/erfc lowering."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act_f32(h, act: Optional[str]):
    if act is None:
        return h
    if act == "gelu":
        # exact (erf) GELU, matching torch.nn.GELU default
        return 0.5 * h * (1.0 + _erf_f32(h * (2.0 ** -0.5)))
    if act == "gelu_new":
        return jax.nn.gelu(h, approximate=True)
    if act == "quick_gelu":
        # OpenAI CLIP: x * sigmoid(1.702 x)
        return h * jax.nn.sigmoid(1.702 * h)
    if act == "silu":
        return jax.nn.silu(h)
    if act == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(f"unknown act {act!r}")


def _dense_kernel(
    *args,
    eps, act, clip, norm, has_wscale, has_ln, has_ln_bias, has_bias,
    has_residual, has_gate, w_transposed=False, stacked_w=False,
):
    if stacked_w:
        # scalar-prefetch layer index is consumed by the block index
        # maps only; the kernel body sees layer-local blocks
        _layer_ref, x_ref, w_ref, *rest = args
    else:
        x_ref, w_ref, *rest = args
    i = 0
    ws_ref = rest[i] if has_wscale else None
    i += has_wscale
    ln_s = rest[i] if has_ln else None
    i += has_ln
    ln_b = rest[i] if has_ln_bias else None
    i += has_ln_bias
    b_ref = rest[i] if has_bias else None
    i += has_bias
    res_ref = rest[i] if has_residual else None
    i += has_residual
    gate_ref = rest[i] if has_gate else None
    i += has_gate
    o_ref = rest[i]

    h = _norm_f32(x_ref[...], ln_s, ln_b, eps, norm) if has_ln else (
        x_ref[...].astype(jnp.float32)
    )
    w = w_ref[...]
    if w.dtype in (jnp.int8, jnp.int4):
        # int8/int4 weight streaming: |w_q| <= 127 so the int -> bf16
        # convert is exact; per-out-channel scales apply on the output.
        # int4 is packed 2-per-byte in HBM — quarter the bf16 stream.
        w = w.astype(x_ref.dtype)
    y = jax.lax.dot_general(
        h.astype(x_ref.dtype), w,
        (((1,), (1 if w_transposed else 0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_wscale:
        y = y * ws_ref[0].astype(jnp.float32)
    if has_bias:
        y = y + b_ref[0].astype(jnp.float32)
    if clip is not None:
        y = jnp.clip(y, -clip, clip)
    y = _act_f32(y, act)
    if has_gate:
        # full-ref read: Mosaic only supports 32-bit scalar extracts,
        # and the gate may be bf16 — broadcast the (1, 1) array instead
        y = y * jnp.tanh(gate_ref[...].astype(jnp.float32))
    if has_residual:
        y = y + res_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def fused_dense(
    x: jax.Array,               # (B, K)
    w: jax.Array,               # (K, N), bf16/f32 or int8 (w_scale set)
    *,
    w_scale: Optional[jax.Array] = None,      # (N,) per-out-channel
    bias: Optional[jax.Array] = None,        # (N,)
    ln_scale: Optional[jax.Array] = None,     # (K,) -> norm(x) first
    ln_bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    norm: str = "layer",                       # "layer" | "rms"
    act: Optional[str] = None,
    clip: Optional[float] = None,
    residual: Optional[jax.Array] = None,     # (B, N)
    gate: Optional[jax.Array] = None,         # scalar/(1,): *tanh(gate)
    w_transposed: bool = False,                # w is (N, K); y = x @ w.T
    layer_idx=None,            # scalar int32: stacked-weight layer select
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """epilogue(LN?(x) @ W): one launch, weights streamed at line rate.

    Epilogue order: *w_scale -> +bias -> clip -> act -> *tanh(gate) ->
    +residual. w_transposed streams a (N, K) weight (e.g. a tied
    embedding table used as the LM head) without materializing its
    transpose. With int8 `w` + per-out-channel `w_scale`, the weight
    stream halves — the decode DMA floor (BASELINE.md roofline).

    layer_idx (scan decode): every per-layer operand (w, w_scale, bias,
    ln_scale/bias, gate) arrives with a leading L axis and the kernel's
    block index maps select layer `layer_idx` directly from HBM via
    scalar prefetch — no dynamic-slice materialization of the layer's
    weights (the round-2 lax.scan decode regression, CLAUDE.md).
    """
    interpret = INTERPRET if interpret is None else interpret
    b, k = x.shape
    stacked = layer_idx is not None
    wl = w.shape[1:] if stacked else w.shape
    if w_transposed:
        n, k2 = wl
    else:
        k2, n = wl
    assert k == k2, (x.shape, w.shape)
    block_n = min(BLOCK_N if block_n is None else block_n, n)
    # ragged N (e.g. a vocab that isn't lane-aligned) is fine: the last
    # block's out-of-bounds columns read garbage weights whose products
    # stay in that block's discarded output region (masked stores)

    # Index-map conventions: with scalar prefetch the maps receive
    # (grid_i, layer_ref); lead() prepends the layer pick for stacked
    # operands, whose block shapes squeeze the L axis with None.
    if stacked:
        def smap(f):
            return lambda i, L: (L[0], *f(i))

        def umap(f):
            return lambda i, L: f(i)
    else:
        def smap(f):
            return lambda i: f(i)

        def umap(f):
            return lambda i: f(i)

    def sshape(shape):
        return (None, *shape) if stacked else shape

    operands = [x, w]
    in_specs = [
        pl.BlockSpec((b, k), umap(lambda i: (0, 0))),
        pl.BlockSpec(sshape((block_n, k)), smap(lambda i: (i, 0)))
        if w_transposed
        else pl.BlockSpec(sshape((k, block_n)), smap(lambda i: (0, i))),
    ]

    def vec(v, dim):
        v = jnp.asarray(v)
        return v.reshape(-1, 1, dim) if stacked else v.reshape(1, dim)

    if w_scale is not None:
        operands.append(vec(w_scale.astype(jnp.float32), n))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_n)), smap(lambda i: (0, i)))
        )
    if ln_scale is not None:
        operands.append(vec(ln_scale, k))
        in_specs.append(pl.BlockSpec(sshape((1, k)), smap(lambda i: (0, 0))))
    if ln_bias is not None:
        assert ln_scale is not None
        operands.append(vec(ln_bias, k))
        in_specs.append(pl.BlockSpec(sshape((1, k)), smap(lambda i: (0, 0))))
    if bias is not None:
        operands.append(vec(bias, n))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_n)), smap(lambda i: (0, i)))
        )
    if residual is not None:
        operands.append(residual)
        in_specs.append(pl.BlockSpec((b, block_n), umap(lambda i: (0, i))))
    if gate is not None:
        operands.append(
            jnp.asarray(gate, jnp.float32).reshape(-1, 1, 1)
            if stacked
            else jnp.asarray(gate, jnp.float32).reshape(1, 1)
        )
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda i: (0, 0))))

    kernel = functools.partial(
        _dense_kernel,
        eps=eps, act=act, clip=clip, norm=norm,
        has_wscale=w_scale is not None,
        has_ln=ln_scale is not None,
        has_ln_bias=ln_bias is not None,
        has_bias=bias is not None,
        has_residual=residual is not None,
        has_gate=gate is not None,
        w_transposed=w_transposed,
        stacked_w=stacked,
    )
    from jax.experimental.pallas import tpu as pltpu

    out_spec = pl.BlockSpec((b, block_n), umap(lambda i: (0, i)))
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pl.cdiv(n, block_n),),
            in_specs=in_specs,
            out_specs=out_spec,
        )
        call_kw = dict(grid_spec=grid_spec)
        pre = (jnp.asarray(layer_idx, jnp.int32).reshape(1),)
    else:
        call_kw = dict(
            grid=(pl.cdiv(n, block_n),),
            in_specs=in_specs,
            out_specs=out_spec,
        )
        pre = ()

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
        # default scoped-vmem budget is 16MB; raise it so 4-8MB weight
        # blocks double-buffer (bigger DMAs -> closer to HBM line rate)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
        **call_kw,
    )(*pre, *operands)


def unpack_side_refs(rest, i, *, has_side, has_side_ws, has_side_ln,
                     has_side_ln_bias, has_side_b, has_side_res):
    """Unpack the side-tile input refs appended by append_side_operands
    (same order). Returns (refs tuple, next index)."""
    sx_ref = rest[i] if has_side else None
    i += has_side
    sw_ref = rest[i] if has_side else None
    i += has_side
    sws_ref = rest[i] if has_side_ws else None
    i += has_side_ws
    sls_ref = rest[i] if has_side_ln else None
    i += has_side_ln
    slb_ref = rest[i] if has_side_ln_bias else None
    i += has_side_ln_bias
    sb_ref = rest[i] if has_side_b else None
    i += has_side_b
    sres_ref = rest[i] if has_side_res else None
    i += has_side_res
    return (sx_ref, sw_ref, sws_ref, sls_ref, slb_ref, sb_ref, sres_ref), i


def side_tile_compute(
    refs, so_ref, *, side_act, side_eps, has_side_ln, has_side_ws,
    has_side_b, has_side_res,
):
    """One side-stream tile: an UNRELATED matmul block rides this grid
    step's otherwise-idle MXU while the main weight blocks DMA (Mosaic
    pipelines block fetches against compute). Free as long as the side
    FLOPs stay under the per-step DMA window; the side activation/out
    traffic is added DMA and pays at line rate
    (scripts_dev/tpu_overlap_probe2.py). Used to hide the next batch's
    ViT forward inside the decode loop — shared by the MLP and
    attention-block carrier kernels."""
    sx_ref, sw_ref, sws_ref, sls_ref, slb_ref, sb_ref, sres_ref = refs
    sx = sx_ref[...]
    if has_side_ln:
        sh = _norm_f32(sx, sls_ref, slb_ref, side_eps, "layer")
    else:
        sh = sx.astype(jnp.float32)
    sh = _act_f32(sh, side_act)
    if has_side_ws:
        # W8A8 side dot: the side tile is MXU-bound when it exceeds
        # the launch's DMA window (the int4-stream regime) — int8 x
        # int8 -> int32 runs ~1.45x the bf16 MXU rate (w8a8.py).
        # Dynamic per-row activation quant in-register; the weight
        # arrives pre-quantized with per-out-channel scales.
        amax = jnp.max(jnp.abs(sh), axis=-1, keepdims=True)
        s_act = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        sq = jnp.clip(jnp.round(sh / s_act), -127, 127).astype(
            jnp.int8
        )
        so = jax.lax.dot_general(
            sq, sw_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * s_act * sws_ref[0].astype(jnp.float32)
    else:
        so = jax.lax.dot_general(
            sh.astype(sx.dtype), sw_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if has_side_b:
        so = so + sb_ref[0].astype(jnp.float32)
    if has_side_res:
        so = so + sres_ref[...].astype(jnp.float32)
    so_ref[...] = so.astype(so_ref.dtype)


def append_side_operands(
    operands, in_specs, *, side_x, side_w, side_w_scale, side_ln,
    side_b, side_residual, grid_n, umap,
):
    """Append the side-tile inputs (M-partitioned over a grid_n-step
    grid) to a carrier kernel's operand/spec lists; returns (smb, sn).
    Side operands never carry the stacked layer axis: the caller slices
    per-layer side weights outside (one small XLA slice per launch
    group, vs reworking the scalar-prefetch maps for an independent
    second index)."""
    assert side_w is not None
    sm, sk = side_x.shape
    skb, sn = side_w.shape
    assert sk == skb, (side_x.shape, side_w.shape)
    assert sm % grid_n == 0, (
        f"side_x rows {sm} must be a multiple of the carrier grid size "
        f"{grid_n} (one side row-block rides each grid step)"
    )
    smb = sm // grid_n
    operands.extend([side_x, side_w])
    in_specs.extend([
        pl.BlockSpec((smb, sk), umap(lambda i: (i, 0))),
        pl.BlockSpec((sk, sn), umap(lambda i: (0, 0))),
    ])
    if side_w_scale is not None:
        assert side_w.dtype == jnp.int8, side_w.dtype
        operands.append(
            jnp.asarray(side_w_scale, jnp.float32).reshape(1, sn)
        )
        in_specs.append(pl.BlockSpec((1, sn), umap(lambda i: (0, 0))))
    if side_ln is not None:
        operands.append(jnp.asarray(side_ln[0]).reshape(1, sk))
        in_specs.append(pl.BlockSpec((1, sk), umap(lambda i: (0, 0))))
        if side_ln[1] is not None:
            operands.append(jnp.asarray(side_ln[1]).reshape(1, sk))
            in_specs.append(
                pl.BlockSpec((1, sk), umap(lambda i: (0, 0)))
            )
    if side_b is not None:
        operands.append(jnp.asarray(side_b).reshape(1, sn))
        in_specs.append(pl.BlockSpec((1, sn), umap(lambda i: (0, 0))))
    if side_residual is not None:
        operands.append(side_residual)
        in_specs.append(
            pl.BlockSpec((smb, sn), umap(lambda i: (i, 0)))
        )
    return smb, sn


def side_kernel_flags(*, side_x, side_w_scale, side_ln, side_act,
                      side_b, side_residual, side_eps):
    """kwargs for a carrier kernel's side-tile functools.partial."""
    has_side = side_x is not None
    return dict(
        has_side=has_side,
        has_side_ln=has_side and side_ln is not None,
        has_side_ln_bias=(
            has_side and side_ln is not None and side_ln[1] is not None
        ),
        side_act=side_act,
        has_side_b=has_side and side_b is not None,
        has_side_res=has_side and side_residual is not None,
        side_eps=side_eps,
        has_side_ws=has_side and side_w_scale is not None,
    )


def _mlp_kernel(
    *args,
    eps, act, norm, has_ln, has_ln_bias, has_w1b, has_b1, has_b2,
    has_residual, has_gate, has_w1s, has_w2s, has_w1bs, k2_total,
    block_k2, stacked_w=False,
    has_side=False, has_side_ln=False, has_side_ln_bias=False,
    side_act=None, has_side_b=False, has_side_res=False,
    side_eps=1e-5, has_side_ws=False,
):
    if stacked_w:
        _layer_ref, x_ref, w1_ref, w2_ref, *rest = args
    else:
        x_ref, w1_ref, w2_ref, *rest = args
    i = 0
    w1b_ref = rest[i] if has_w1b else None
    i += has_w1b
    w1s_ref = rest[i] if has_w1s else None
    i += has_w1s
    w2s_ref = rest[i] if has_w2s else None
    i += has_w2s
    w1bs_ref = rest[i] if has_w1bs else None
    i += has_w1bs
    ln_s = rest[i] if has_ln else None
    i += has_ln
    ln_b = rest[i] if has_ln_bias else None
    i += has_ln_bias
    b1_ref = rest[i] if has_b1 else None
    i += has_b1
    b2_ref = rest[i] if has_b2 else None
    i += has_b2
    res_ref = rest[i] if has_residual else None
    i += has_residual
    gate_ref = rest[i] if has_gate else None
    i += has_gate
    side_refs, i = unpack_side_refs(
        rest, i, has_side=has_side, has_side_ws=has_side_ws,
        has_side_ln=has_side_ln, has_side_ln_bias=has_side_ln_bias,
        has_side_b=has_side_b, has_side_res=has_side_res,
    )
    if has_side:
        o_ref, so_ref, acc_ref = rest[i], rest[i + 1], rest[i + 2]
    else:
        o_ref, acc_ref = rest[i], rest[i + 1]

    ki = pl.program_id(0)

    if has_side:
        side_tile_compute(
            side_refs, so_ref, side_act=side_act, side_eps=side_eps,
            has_side_ln=has_side_ln, has_side_ws=has_side_ws,
            has_side_b=has_side_b, has_side_res=has_side_res,
        )

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if has_ln:
        h = _norm_f32(x_ref[...], ln_s, ln_b, eps, norm)
    else:
        h = x_ref[...].astype(jnp.float32)
    hd = h.astype(x_ref.dtype)

    def cast_w(w):
        # int8/int4 -> compute dtype is exact (|w_q| <= 127, bf16 has 8
        # mantissa bits); scales apply per out-channel on the output
        return (
            w.astype(x_ref.dtype)
            if w.dtype in (jnp.int8, jnp.int4)
            else w
        )

    u = jax.lax.dot_general(
        hd, cast_w(w1_ref[...]),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (B, BK2)
    if has_w1s:
        u = u * w1s_ref[0].astype(jnp.float32)
    if has_b1:
        u = u + b1_ref[0].astype(jnp.float32)
    u = _act_f32(u, act)
    if has_w1b:
        # SwiGLU: act(x@w1) * (x@w1b)
        u2 = jax.lax.dot_general(
            hd, cast_w(w1b_ref[...]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_w1bs:
            u2 = u2 * w1bs_ref[0].astype(jnp.float32)
        u = u * u2
    w2b = cast_w(w2_ref[...])
    if k2_total % block_k2 != 0:
        # Ragged hidden axis (llama-7B 11008, OPT/pythia 3072 with
        # block 2048): the last grid block's out-of-bounds W1/b1/W2
        # reads are undefined (NaN in interpret mode). K2 is the
        # reduction axis of the second matmul, so BOTH sides must be
        # zeroed — where-selects kill NaN/Inf; 0*0 contributes exactly 0.
        lane = ki * block_k2 + jax.lax.broadcasted_iota(
            jnp.int32, u.shape, 1
        )
        u = jnp.where(lane < k2_total, u, 0.0)
        row = ki * block_k2 + jax.lax.broadcasted_iota(
            jnp.int32, w2b.shape, 0
        )
        w2b = jnp.where(row < k2_total, w2b, jnp.zeros_like(w2b))
    acc_ref[...] += jax.lax.dot_general(
        u.astype(x_ref.dtype), w2b,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (B, N)

    @pl.when(ki == pl.num_programs(0) - 1)
    def _fin():
        y = acc_ref[...]
        if has_w2s:
            # per-out-channel W2 scale is constant across the K2 grid,
            # so it commutes with the accumulation
            y = y * w2s_ref[0].astype(jnp.float32)
        if has_b2:
            y = y + b2_ref[0].astype(jnp.float32)
        if has_gate:
            # (1, 1) array read — sub-32-bit scalar extracts unsupported
            y = y * jnp.tanh(gate_ref[...].astype(jnp.float32))
        if has_residual:
            y = y + res_ref[...].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)


def fused_mlp(
    x: jax.Array,               # (B, K)
    w1: jax.Array,              # (K, K2)
    w2: jax.Array,              # (K2, N)
    *,
    w1_gate: Optional[jax.Array] = None,       # (K, K2) SwiGLU up-proj
    w1_scale: Optional[jax.Array] = None,      # (K2,) int8 w1 scales
    w2_scale: Optional[jax.Array] = None,      # (N,)  int8 w2 scales
    w1_gate_scale: Optional[jax.Array] = None,  # (K2,)
    b1: Optional[jax.Array] = None,
    b2: Optional[jax.Array] = None,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    eps: float = 1e-5,
    norm: str = "layer",
    act: str = "gelu",
    residual: Optional[jax.Array] = None,      # (B, N)
    gate: Optional[jax.Array] = None,
    layer_idx=None,            # scalar int32: stacked-weight layer select
    block_k2: Optional[int] = None,
    side_x: Optional[jax.Array] = None,        # (SM, SK) streamed tile in
    side_w: Optional[jax.Array] = None,        # (SK, SN) resident weight
    side_w_scale: Optional[jax.Array] = None,  # (SN,) int8 side_w scales
    side_ln: Optional[tuple] = None,           # (scale(SK,), bias|None)
    side_eps: float = 1e-5,                    # side-LN eps (CLIP: 1e-5)
    side_act: Optional[str] = None,            # pre-act on side_x rows
    side_b: Optional[jax.Array] = None,        # (SN,) side output bias
    side_residual: Optional[jax.Array] = None,  # (SM, SN) streamed
    interpret: Optional[bool] = None,
):
    """residual + tanh(gate) * (act(LN?(x) @ W1 + b1) @ W2 + b2).

    With w1_gate (SwiGLU): u = act(h @ W1 + b1) * (h @ w1_gate).
    Grid over the hidden axis: step i streams W1[:, i] and W2[i, :]
    blocks through one pipeline and accumulates partial products in an
    fp32 VMEM scratch — the (B, K2) intermediate never exists in HBM.

    layer_idx: stacked-weight scan decode — per-layer operands carry a
    leading L axis, selected in the block index maps via scalar
    prefetch (see fused_dense).

    side_x/side_w: optional SIDE-STREAM tile — an unrelated matmul
    side_out = act(LN?(side_x)) @ side_w (+ side_residual) computed on
    the launch's idle MXU while the main weights DMA, M-partitioned
    across the grid (side_x rows must divide by the grid size). The
    return becomes (y, side_out). This is the absorption primitive for
    hiding the next batch's ViT forward inside the DMA-bound decode
    loop (overlap law: scripts_dev/tpu_overlap_probe2.py, BASELINE.md).
    """
    b, k = x.shape
    stacked = layer_idx is not None
    k1, k2 = w1.shape[1:] if stacked else w1.shape
    k2b, n = w2.shape[1:] if stacked else w2.shape
    interpret = INTERPRET if interpret is None else interpret
    assert k1 == k and k2b == k2, (x.shape, w1.shape, w2.shape)
    if block_k2 is None:
        # dtype-aware default (stacked/scan path only): bf16 weight
        # blocks carry 2x the bytes of int8, so the fill-exposure-
        # optimal block is half the size. Unrolled keeps round-3 blocks.
        if not stacked:
            block_k2 = BLOCK_K2_UNROLLED
        elif w1.dtype in (jnp.int8, jnp.int4):
            block_k2 = BLOCK_K2
        else:
            block_k2 = BLOCK_K2_BF16
    block_k2 = min(block_k2, k2)
    # ragged K2 (k2 % block_k2 != 0) is handled by in-kernel lane
    # masking of the last block — see _mlp_kernel

    if stacked:
        def smap(f):
            return lambda i, L: (L[0], *f(i))

        def umap(f):
            return lambda i, L: f(i)
    else:
        def smap(f):
            return lambda i: f(i)

        def umap(f):
            return lambda i: f(i)

    def sshape(shape):
        return (None, *shape) if stacked else shape

    operands = [x, w1, w2]
    in_specs = [
        pl.BlockSpec((b, k), umap(lambda i: (0, 0))),
        pl.BlockSpec(sshape((k, block_k2)), smap(lambda i: (0, i))),
        pl.BlockSpec(sshape((block_k2, n)), smap(lambda i: (i, 0))),
    ]
    if w1_gate is not None:
        operands.append(w1_gate)
        in_specs.append(
            pl.BlockSpec(sshape((k, block_k2)), smap(lambda i: (0, i)))
        )

    def vec(v, dim):
        v = jnp.asarray(v)
        return v.reshape(-1, 1, dim) if stacked else v.reshape(1, dim)

    if w1_scale is not None:
        operands.append(vec(w1_scale.astype(jnp.float32), k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)), smap(lambda i: (0, i)))
        )
    if w2_scale is not None:
        operands.append(vec(w2_scale.astype(jnp.float32), n))
        in_specs.append(pl.BlockSpec(sshape((1, n)), smap(lambda i: (0, 0))))
    if w1_gate_scale is not None:
        assert w1_gate is not None
        operands.append(vec(w1_gate_scale.astype(jnp.float32), k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)), smap(lambda i: (0, i)))
        )
    if ln_scale is not None:
        operands.append(vec(ln_scale, k))
        in_specs.append(pl.BlockSpec(sshape((1, k)), smap(lambda i: (0, 0))))
    if ln_bias is not None:
        assert ln_scale is not None
        operands.append(vec(ln_bias, k))
        in_specs.append(pl.BlockSpec(sshape((1, k)), smap(lambda i: (0, 0))))
    if b1 is not None:
        operands.append(vec(b1, k2))
        in_specs.append(
            pl.BlockSpec(sshape((1, block_k2)), smap(lambda i: (0, i)))
        )
    if b2 is not None:
        operands.append(vec(b2, n))
        in_specs.append(pl.BlockSpec(sshape((1, n)), smap(lambda i: (0, 0))))
    if residual is not None:
        operands.append(residual)
        in_specs.append(pl.BlockSpec((b, n), umap(lambda i: (0, 0))))
    if gate is not None:
        operands.append(
            jnp.asarray(gate, jnp.float32).reshape(-1, 1, 1)
            if stacked
            else jnp.asarray(gate, jnp.float32).reshape(1, 1)
        )
        in_specs.append(pl.BlockSpec(sshape((1, 1)), smap(lambda i: (0, 0))))

    grid_n = pl.cdiv(k2, block_k2)
    has_side = side_x is not None
    if has_side:
        smb, sn = append_side_operands(
            operands, in_specs, side_x=side_x, side_w=side_w,
            side_w_scale=side_w_scale, side_ln=side_ln, side_b=side_b,
            side_residual=side_residual, grid_n=grid_n, umap=umap,
        )

    kernel = functools.partial(
        _mlp_kernel,
        eps=eps, act=act, norm=norm,
        has_ln=ln_scale is not None,
        has_ln_bias=ln_bias is not None,
        has_w1b=w1_gate is not None,
        has_b1=b1 is not None,
        has_b2=b2 is not None,
        has_residual=residual is not None,
        has_gate=gate is not None,
        has_w1s=w1_scale is not None,
        has_w2s=w2_scale is not None,
        has_w1bs=w1_gate_scale is not None,
        k2_total=k2, block_k2=block_k2,
        stacked_w=stacked,
        **side_kernel_flags(
            side_x=side_x, side_w_scale=side_w_scale, side_ln=side_ln,
            side_act=side_act, side_b=side_b,
            side_residual=side_residual, side_eps=side_eps,
        ),
    )
    from jax.experimental.pallas import tpu as pltpu

    out_spec = pl.BlockSpec((b, n), umap(lambda i: (0, 0)))
    if has_side:
        out_spec = [
            out_spec,
            pl.BlockSpec((smb, sn), umap(lambda i: (i, 0))),
        ]
    scratch = [pltpu.VMEM((b, n), jnp.float32)]
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        call_kw = dict(grid_spec=grid_spec)
        pre = (jnp.asarray(layer_idx, jnp.int32).reshape(1),)
    else:
        call_kw = dict(
            grid=(grid_n,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch,
        )
        pre = ()

    out_shape = jax.ShapeDtypeStruct((b, n), x.dtype)
    if has_side:
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((side_x.shape[0], sn), side_x.dtype),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
        **call_kw,
    )(*pre, *operands)


def reference_dense(
    x, w, *, w_scale=None, bias=None, ln_scale=None, ln_bias=None,
    eps=1e-5, norm="layer", act=None, clip=None, residual=None, gate=None,
):
    """Plain-jnp semantics mirror of fused_dense (parity tests)."""
    if w.dtype in (jnp.int8, jnp.int4):
        w = w.astype(x.dtype)
    h = x.astype(jnp.float32)
    if ln_scale is not None:
        if norm == "rms":
            var = jnp.square(h).mean(-1, keepdims=True)
            h = h * jax.lax.rsqrt(var + eps) * ln_scale
        else:
            mu = h.mean(-1, keepdims=True)
            var = jnp.maximum(
                0.0, jnp.square(h).mean(-1, keepdims=True) - jnp.square(mu)
            )
            h = (h - mu) * jax.lax.rsqrt(var + eps) * ln_scale
        if ln_bias is not None:
            h = h + ln_bias
    y = jax.lax.dot_general(
        h.astype(x.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if w_scale is not None:
        y = y * w_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if clip is not None:
        y = jnp.clip(y, -clip, clip)
    y = _act_f32(y, act)
    if gate is not None:
        y = y * jnp.tanh(jnp.asarray(gate).astype(jnp.float32)).reshape(())
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def reference_mlp(
    x, w1, w2, *, w1_gate=None, w1_scale=None, w2_scale=None,
    w1_gate_scale=None, b1=None, b2=None, ln_scale=None,
    ln_bias=None, eps=1e-5, norm="layer", act="gelu", residual=None,
    gate=None,
):
    u = reference_dense(
        x, w1, w_scale=w1_scale, bias=b1, ln_scale=ln_scale,
        ln_bias=ln_bias, eps=eps, norm=norm, act=act,
    )
    if w1_gate is not None:
        u = u * reference_dense(
            x, w1_gate, w_scale=w1_gate_scale, ln_scale=ln_scale,
            ln_bias=ln_bias, eps=eps, norm=norm,
        )
    return reference_dense(
        u, w2, w_scale=w2_scale, bias=b2, residual=residual, gate=gate
    )
