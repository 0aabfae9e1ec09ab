"""Cross-batch absorbed ViT: batch i+1's vision encode rides batch i's
decode loop as fused-kernel side tiles.

The decode loop is weight-DMA-bound (BASELINE.md decode anatomy): its
MXU idles most of every launch while weight blocks stream from HBM.
This module schedules the NEXT batch's CLIP ViT forward
(open_flamingo/src/flamingo.py:177-200 — the per-batch vision encode
this hides) as `fused_mlp` side-stream tiles on the stacked-weight scan
decode engine's MLP launches (ops/dense_stream.py side_x/side_w), with
the attention glue between projection slots running on the FLAT
(B, S_pad, H*Dh) workspace layout (ops/vit_attention.flat_vit_attention)
so the schedule carries zero head-transpose/pad copies.

Schedule per ViT layer (all side matmuls are (M, D) @ (D, D) tiles —
fc1/fc2 are sliced into D-columns/D-rows so every slot is uniform):

  slot 0-2            q/k/v projections (pre-LN1 fused in-kernel)
  glue                flat_vit_attention on the (B, S_pad, D) view
  slot 3              out-projection (+ workspace residual)
  slot 4..3+n_fc1     fc1 column slices (pre-LN2 fused)
  slot 4+n_fc1..end   fc2 row slices (quick_gelu fused, residual chain)

One decode step's group scan carries `per_step` ViT layers (macro-
grouping in models/scan_decode.py); the greedy loop runs `n_steps`
absorbing steps then continues plain. Measured law: side MXU below the
per-grid-step DMA window is free; side activation bytes pay HBM line
rate (scripts_dev/tpu_overlap_probe2.py, BASELINE.md round 4-5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AbsorbPlan:
    """Static geometry of one absorbed-ViT run (hashable: passed through
    flax apply as a plain argument)."""
    b: int            # language batch of the NEXT batch's vision_x
    t: int            # T_img
    f: int            # frames
    s_real: int       # ViT sequence = num_patches + 1 (CLS)
    s_pad: int        # per-image padded sequence (sublane multiple)
    m_f: int          # b*t*f * s_pad flat rows
    m_pad: int        # m_f rounded to the launch-grid row quantum
    d: int            # ViT hidden size
    heads: int
    n_fc1: int        # intermediate_size // d column slices
    n_fc2: int
    act: str          # ViT MLP activation (quick_gelu for CLIP)
    eps: float        # ViT LayerNorm eps
    macro: int        # decode groups per macro scan iteration
    per_step: int     # ViT layers absorbed per decode step
    n_steps: int      # decode steps that carry side work
    n_vit_layers: int
    # tile split factor: every side matmul is cut into `split` column
    # (projections, fc1) or row (fc2) parts so the per-launch side MXU
    # time fits UNDER the carrying launch's DMA window (measured: a
    # full (8448,1024)@(1024,1024) tile needs ~170us of MXU vs the
    # ~100us bf16 MLP window — exposed; halves fit). Costs one extra
    # stream of the proj/fc1 side_x per extra part + concat copies.
    split: int = 1
    # attention-block launches (mpt self-attn + gated-xattn attend)
    # also carry tiles: they stream the whole KV cache, so their
    # per-grid-step DMA windows are the largest in a quantized decode
    # loop — spreading the same tiles over ~2x the launches halves the
    # per-window side-MXU load (ATTN_CARRIERS knob; round-5 A/B).
    attn_carriers: bool = False

    @property
    def side_groups(self) -> int:
        """Groups of each absorbing decode step that carry side tiles
        (the rest run the plain body — spreading the ViT MXU across
        more launches' DMA windows)."""
        return self.macro * self.per_step

    @property
    def bv(self) -> int:
        return self.b * self.t * self.f

    @property
    def slots_per_layer(self) -> int:
        return self.split * (4 + self.n_fc1 + self.n_fc2)


# split-factor preference order (see make_plan) — module hook so tests
# and A/B drivers can force split=2 without threading a parameter
# through flamingo_generate
PREFER_SPLIT = (1, 2)

# attention-block launches join the carrier set (AbsorbPlan field doc);
# module hook for the on-TPU A/B (scripts_dev/tpu_absorb_ab.py)
ATTN_CARRIERS = False


def _mlp_grid_n(k2: int, int_stream: bool) -> int:
    from ..ops import dense_stream as ds

    bk = ds.BLOCK_K2 if int_stream else ds.BLOCK_K2_BF16
    bk = min(bk, k2)
    return -(-k2 // bk)


def _attn_grid_n(h: int) -> int:
    """attn_block_decode's head-group grid size for `h` heads (the
    stacked/scan path's HEAD_BLOCK, halved until it divides h)."""
    from ..ops.decode_layer import HEAD_BLOCK

    g = HEAD_BLOCK
    while h % g:
        g //= 2
    return h // g


def make_plan(
    cfg,                       # FlamingoConfig
    vision_shape,              # (b, t_img, f) of the NEXT batch
    max_new_tokens: int,
    num_beams: int = 1,
    prefer_split=None,         # default PREFER_SPLIT (test hook)
) -> Optional[AbsorbPlan]:
    """None when the geometry can't carry the schedule (caller falls
    back to the serial embed_vision)."""
    v, lm = cfg.vision, cfg.lm
    if num_beams != 1 or not cfg.scan_layers:
        return None
    d, heads = v.hidden_size, v.num_heads
    dh = d // heads
    # flat attention column-block legality (mirrors flat_vit_attention)
    hpb = max(1, 128 // dh) if d > 128 else heads
    while heads % hpb:
        hpb -= 1
    w = hpb * dh
    if not (w % 128 == 0 or w == d):
        return None
    if v.intermediate_size % d:
        return None
    n_fc1 = n_fc2 = v.intermediate_size // d
    n = cfg.cross_attn_every_n or 1
    if lm.num_layers % n:
        return None
    spg = n + 1                     # xattn MLP + n decoder MLPs / group
    attn_carriers = ATTN_CARRIERS
    if attn_carriers:
        # + the gated-xattn attend launch; mpt's fused attention block
        # is the only family whose self-attn runs through
        # attn_block_decode (the others' attend_out has no side support)
        spg += 1 + (n if lm.family == "mpt" else 0)
    g = lm.num_layers // n
    # split=1 measured BEST on TPU (round 5 A/B): split=2's halved
    # tiles do fit under the bf16 DMA window, but the extra side_x
    # streams (3F vs 3 reads of the workspace) + per-slot fill exposure
    # + concat copies cost MORE than the exposure they save (bf16 B=32
    # overhead 34.2ms split=1 vs 47.1ms split=2 — BASELINE.md). The
    # split machinery stays (tests cover it) for streams with larger
    # windows; selection prefers whole tiles.
    #
    # macro = ceil(spl / spg): when slots_per_layer doesn't divide the
    # group's launch count (OF-9B: n=4 -> 5 MLP launches/group vs 12
    # slots), the macro body's trailing launches simply carry no side
    # tile — static schedule either way.
    macro = split = None
    for fs in (prefer_split or PREFER_SPLIT):
        spl = fs * (4 + n_fc1 + n_fc2)
        if fs > 1 and (d // fs) % 128:
            continue
        cand_macro = -(-spl // spg)
        if cand_macro > g:
            continue
        macro, split = cand_macro, fs
        break
    if macro is None:
        return None
    # spread: absorb as FEW ViT layers per decode step as max_new
    # allows. The hiding budget is the carrying launches' DMA windows;
    # packing the schedule densely (round-5 first cut: g/macro layers
    # in g/macro/... steps) over-subscribed the windows by ~2x and
    # exposed the side MXU (BASELINE.md round-5 integrated A/B). The
    # smallest per_step with n_steps <= max_new and side_groups <= g
    # puts one layer on 12 of the step's launches when max_new >= L_v.
    per_step = None
    for cand in range(1, g // macro + 1):
        if v.num_layers % cand or macro * cand > g:
            continue
        if v.num_layers // cand <= max_new_tokens:
            per_step = cand
            break
    if per_step is None:
        return None
    n_steps = v.num_layers // per_step

    b, t, f = vision_shape
    s_real = v.num_patches + 1
    s_pad = -(-s_real // 8) * 8
    m_f = b * t * f * s_pad
    k2_dec = lm.intermediate_size
    k2_x = 4 * lm.hidden_size       # GatedCrossAttentionBlock ff_mult=4
    # row quantum over BOTH weight-stream dtypes' grids (bf16 vs int
    # blocks differ — dense_stream dtype-aware block_k2) so one plan
    # serves quantized and unquantized params alike
    grids = [
        _mlp_grid_n(k2_dec, True), _mlp_grid_n(k2_dec, False),
        _mlp_grid_n(k2_x, True), _mlp_grid_n(k2_x, False),
    ]
    if attn_carriers:
        # xattn attend always rides attn_block (8 heads, dim_head 64 —
        # the GatedCrossAttentionBlock defaults); mpt self-attn too
        grids.append(_attn_grid_n(8))
        if lm.family == "mpt":
            grids.append(_attn_grid_n(lm.num_heads))
    quantum = 16 * math.lcm(*grids)
    m_pad = -(-m_f // quantum) * quantum
    return AbsorbPlan(
        b=b, t=t, f=f, s_real=s_real, s_pad=s_pad, m_f=m_f, m_pad=m_pad,
        d=d, heads=heads, n_fc1=n_fc1, n_fc2=n_fc2,
        act="quick_gelu" if v.hidden_act == "quick_gelu" else "gelu",
        eps=v.layer_norm_eps, macro=macro, per_step=per_step,
        n_steps=n_steps, n_vit_layers=v.num_layers, split=split,
        attn_carriers=attn_carriers,
    )


# int8 (W8A8) side dots when the ViT qparams side-car is bound —
# measured lever for small-window (int4) carrier streams; module flag
# so A/B drivers can force the bf16 dot.
SIDE_INT8 = True


def stack_vit_params(venc: Dict[str, Any], num_layers: int, dtype):
    """blocks_0..L-1 -> one tree with a leading (L,) axis on every leaf
    (the absorb scan's xs). Weights cast to the compute dtype."""
    blocks = [venc[f"blocks_{i}"] for i in range(num_layers)]
    return jax.tree.map(
        lambda *xs: jnp.stack([x.astype(dtype) for x in xs]), *blocks
    )


def stack_vit_qparams(vq: Dict[str, Any], num_layers: int):
    """qparams blocks (kernel_q int8 / kernel_s f32) stacked like
    stack_vit_params — dtypes preserved."""
    blocks = [vq[f"blocks_{i}"] for i in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def side_step_tree(params, plan: AbsorbPlan, dtype):
    """Build the outer-scan xs for the absorb phase from full model
    variables: {"p": stacked ViT params, "q": stacked qparams} (q only
    when quantize_prefill_params covered the ViT and SIDE_INT8)."""
    venc = params["params"]["vision_encoder"]
    tree = {"p": split_steps(
        stack_vit_params(venc, plan.n_vit_layers, dtype), plan
    )}
    vq = params.get("qparams", {}).get("vision_encoder")
    if vq is not None and SIDE_INT8:
        tree["q"] = split_steps(
            stack_vit_qparams(vq, plan.n_vit_layers), plan
        )
    return tree


def split_steps(stacked, plan: AbsorbPlan):
    """(L, ...) stacked ViT params -> (n_steps, per_step, ...) for the
    outer (decode-step) scan's xs."""
    return jax.tree.map(
        lambda x: x.reshape(plan.n_steps, plan.per_step, *x.shape[1:]),
        stacked,
    )


def _ln(x, scale, bias, eps):
    h = x.astype(jnp.float32)
    mu = h.mean(-1, keepdims=True)
    var = jnp.maximum(0.0, (h * h).mean(-1, keepdims=True) - mu * mu)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    h = h * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return h.astype(x.dtype)


def patch_embed_flat(
    vcfg, venc: Dict[str, Any], pixels: jax.Array, plan: AbsorbPlan,
    dtype,
) -> jax.Array:
    """ViT front half (patchify + embed + CLS + positions + pre-LN —
    models/vit.py:175-202 semantics) producing the FLAT padded
    workspace (m_pad, D) the side schedule streams."""
    bv = pixels.shape[0]
    assert bv == plan.bv, (pixels.shape, plan)
    p, g = vcfg.patch_size, vcfg.grid
    c = vcfg.num_channels
    x = pixels.astype(dtype)
    x = x.reshape(bv, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(bv, g * g, p * p * c)
    x = x @ venc["patch_embed"]["kernel"].astype(dtype)
    cls = venc["class_embedding"].astype(dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (bv, 1, plan.d)), x], axis=1
    )
    x = x + venc["position_embedding"].astype(dtype)[None]
    x = _ln(
        x, venc["pre_layernorm"]["scale"], venc["pre_layernorm"]["bias"],
        plan.eps,
    )
    x = jnp.pad(x, ((0, 0), (0, plan.s_pad - plan.s_real), (0, 0)))
    x = x.reshape(plan.m_f, plan.d)
    if plan.m_pad > plan.m_f:
        x = jnp.pad(x, ((0, plan.m_pad - plan.m_f), (0, 0)))
    return x


def finish_tokens(
    vcfg, venc: Dict[str, Any], xw: jax.Array, plan: AbsorbPlan
) -> jax.Array:
    """Workspace after all absorbed layers -> (b, t, f, v, d) patch
    tokens (post-LN applied, CLS dropped — open_clip output_tokens
    semantics, models/vit.py:222-224)."""
    x = xw[: plan.m_f].reshape(plan.bv, plan.s_pad, plan.d)
    x = x[:, : plan.s_real]
    if vcfg.post_ln_tokens:
        x = _ln(
            x, venc["post_layernorm"]["scale"],
            venc["post_layernorm"]["bias"], plan.eps,
        )
    x = x[:, 1:]
    return x.reshape(plan.b, plan.t, plan.f, plan.s_real - 1, plan.d)


class VitSideFeed:
    """Trace-time scheduler: hands each fused_mlp launch in a macro
    scan body its side-slot kwargs and routes the side outputs. One
    instance per (macro iteration = one ViT layer).

    With plan.split == F every matmul is cut into F parts (projections
    and fc1 by output columns, fc2 by input rows) so each part's MXU
    time fits under one launch's weight-DMA window. Slot layout:

      [0, 3F)            q/k/v column parts (pre-LN1 fused)
      glue               flat attention on the concatenated q/k/v
      [3F, 4F)           out-proj column parts (+ xw column residual)
      [4F, 4F + n1*F)    fc1 column slices (width D/F, pre-LN2 fused)
      [.., end)          fc2 row slices (quick_gelu, residual chain)
    """

    def __init__(self, vp, xw: jax.Array,
                 plan: AbsorbPlan, interpret: Optional[bool] = None):
        # vp: ViT layer params tree, or (params, qparams|None) — the
        # qparams side-car (quantize_prefill_params) turns the side
        # dots int8 (W8A8): the win when the tile is MXU-bound because
        # the carrying stream's DMA window is small (int4 decode).
        if isinstance(vp, tuple):
            self.vp, self.vq = vp
        else:
            self.vp, self.vq = vp, None
        self.xw = xw
        self.plan = plan
        self.interpret = interpret
        self.slot = 0
        self.qkv = [[], [], []]    # column parts per projection
        self.x2_parts = []
        self.x2 = None
        self.att = None
        self.h = []
        self.acc = None

    def _cols(self, w, i, width):
        return jax.lax.slice_in_dim(w, i * width, (i + 1) * width, axis=1)

    def _rows(self, w, i, width):
        return jax.lax.slice_in_dim(w, i * width, (i + 1) * width, axis=0)

    def _w(self, name, i, width, axis):
        """side_w (+ side_w_scale when the int8 side-car covers name).
        axis=1: column slice (scales slice along with the out-channels);
        axis=0: row slice (out-channels intact, scales whole)."""
        q = (self.vq or {}).get(name)
        if q is not None and "kernel_q" in q:
            wq = (self._cols if axis == 1 else self._rows)(
                q["kernel_q"], i, width
            )
            s = q["kernel_s"]
            if axis == 1:
                s = self._rows(s, i, width)   # (N,) sliced with columns
            return dict(side_w=wq, side_w_scale=s)
        k = self.vp[name]["kernel"]
        return dict(side_w=(self._cols if axis == 1 else self._rows)(
            k, i, width
        ))

    def _glue(self):
        from ..ops.vit_attention import flat_vit_attention

        p = self.plan

        def to3(parts):
            x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
            return x[: p.m_f].reshape(p.bv, p.s_pad, p.d)

        dh = p.d // p.heads
        out = flat_vit_attention(
            to3(self.qkv[0]), to3(self.qkv[1]), to3(self.qkv[2]),
            dh ** -0.5, heads=p.heads, s_real=p.s_real,
            interpret=self.interpret,
        ).reshape(p.m_f, p.d)
        if p.m_pad > p.m_f:
            out = jnp.pad(out, ((0, p.m_pad - p.m_f), (0, 0)))
        return out

    def kwargs(self) -> Dict[str, Any]:
        vp, p, s = self.vp, self.plan, self.slot
        F = p.split
        w = p.d // F
        kw = dict(side_eps=p.eps)
        if s < 3 * F:
            name = ("q_proj", "k_proj", "v_proj")[s // F]
            i = s % F
            return dict(
                side_x=self.xw, **self._w(name, i, w, axis=1),
                side_ln=(vp["layer_norm1"]["scale"],
                         vp["layer_norm1"]["bias"]),
                side_b=self._rows(vp[name]["bias"], i, w), **kw,
            )
        if s < 4 * F:
            if self.att is None:
                self.att = self._glue()
            i = s - 3 * F
            return dict(
                side_x=self.att,
                **self._w("out_proj", i, w, axis=1),
                side_b=self._rows(vp["out_proj"]["bias"], i, w),
                side_residual=self._cols(self.xw, i, w), **kw,
            )
        if s < (4 + p.n_fc1) * F:
            i = s - 4 * F
            return dict(
                side_x=self.x2,
                **self._w("fc1", i, w, axis=1),
                side_ln=(vp["layer_norm2"]["scale"],
                         vp["layer_norm2"]["bias"]),
                side_b=self._rows(vp["fc1"]["bias"], i, w), **kw,
            )
        i = s - (4 + p.n_fc1) * F
        return dict(
            side_x=self.h[i], **self._w("fc2", i, w, axis=0),
            side_act=p.act,
            side_b=vp["fc2"]["bias"] if i == 0 else None,
            side_residual=self.acc, **kw,
        )

    def take(self, so: jax.Array):
        s, p = self.slot, self.plan
        F = p.split
        self.slot += 1
        if s < 3 * F:
            self.qkv[s // F].append(so)
        elif s < 4 * F:
            self.x2_parts.append(so)
            if len(self.x2_parts) == F:
                self.x2 = (
                    self.x2_parts[0] if F == 1
                    else jnp.concatenate(self.x2_parts, -1)
                )
                self.acc = self.x2   # fc2 residual chain starts at x2
        elif s < (4 + p.n_fc1) * F:
            self.h.append(so)
        else:
            self.acc = so

    def result(self) -> jax.Array:
        assert self.slot == self.plan.slots_per_layer, (
            f"side schedule consumed {self.slot} of "
            f"{self.plan.slots_per_layer} slots"
        )
        return self.acc
