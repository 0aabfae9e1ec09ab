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

    @property
    def bv(self) -> int:
        return self.b * self.t * self.f

    @property
    def slots_per_layer(self) -> int:
        return 4 + self.n_fc1 + self.n_fc2


def _mlp_grid_n(k2: int, int_stream: bool) -> int:
    from ..ops import dense_stream as ds

    bk = ds.BLOCK_K2 if int_stream else ds.BLOCK_K2_BF16
    bk = min(bk, k2)
    return -(-k2 // bk)


def make_plan(
    cfg,                       # FlamingoConfig
    vision_shape,              # (b, t_img, f) of the NEXT batch
    max_new_tokens: int,
    int_stream: bool,          # decode MLP weights stream int8/int4
    num_beams: int = 1,
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
    spl = 4 + n_fc1 + n_fc2
    n = cfg.cross_attn_every_n or 1
    if lm.num_layers % n:
        return None
    spg = n + 1                     # xattn MLP + n decoder MLPs / group
    if spl % spg:
        return None
    macro = spl // spg
    g = lm.num_layers // n
    if g % macro:
        return None
    per_step = g // macro
    if v.num_layers % per_step:
        return None
    n_steps = v.num_layers // per_step
    if max_new_tokens < n_steps:
        return None

    b, t, f = vision_shape
    s_real = v.num_patches + 1
    s_pad = -(-s_real // 8) * 8
    m_f = b * t * f * s_pad
    k2_dec = lm.intermediate_size
    k2_x = 4 * lm.hidden_size       # GatedCrossAttentionBlock ff_mult=4
    quantum = 16 * math.lcm(
        _mlp_grid_n(k2_dec, int_stream), _mlp_grid_n(k2_x, int_stream)
    )
    m_pad = -(-m_f // quantum) * quantum
    return AbsorbPlan(
        b=b, t=t, f=f, s_real=s_real, s_pad=s_pad, m_f=m_f, m_pad=m_pad,
        d=d, heads=heads, n_fc1=n_fc1, n_fc2=n_fc2,
        act="quick_gelu" if v.hidden_act == "quick_gelu" else "gelu",
        eps=v.layer_norm_eps, macro=macro, per_step=per_step,
        n_steps=n_steps, n_vit_layers=v.num_layers,
    )


def stack_vit_params(venc: Dict[str, Any], num_layers: int, dtype):
    """blocks_0..L-1 -> one tree with a leading (L,) axis on every leaf
    (the absorb scan's xs). Weights cast to the compute dtype."""
    blocks = [venc[f"blocks_{i}"] for i in range(num_layers)]
    return jax.tree.map(
        lambda *xs: jnp.stack([x.astype(dtype) for x in xs]), *blocks
    )


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
    instance per (macro iteration = one ViT layer)."""

    def __init__(self, vp: Dict[str, Any], xw: jax.Array,
                 plan: AbsorbPlan, interpret: Optional[bool] = None):
        self.vp = vp
        self.xw = xw
        self.plan = plan
        self.interpret = interpret
        self.slot = 0
        self.q = self.k = self.v = self.x2 = None
        self.h = []
        self.acc = None

    def _slice1(self, w, i):
        d = self.plan.d
        return jax.lax.slice_in_dim(w, i * d, (i + 1) * d, axis=1)

    def _slice0(self, w, i):
        d = self.plan.d
        return jax.lax.slice_in_dim(w, i * d, (i + 1) * d, axis=0)

    def _glue(self):
        from ..ops.vit_attention import flat_vit_attention

        p = self.plan

        def to3(x):
            return x[: p.m_f].reshape(p.bv, p.s_pad, p.d)

        dh = p.d // p.heads
        out = flat_vit_attention(
            to3(self.q), to3(self.k), to3(self.v), dh ** -0.5,
            heads=p.heads, s_real=p.s_real, interpret=self.interpret,
        ).reshape(p.m_f, p.d)
        if p.m_pad > p.m_f:
            out = jnp.pad(out, ((0, p.m_pad - p.m_f), (0, 0)))
        return out

    def kwargs(self) -> Dict[str, Any]:
        vp, p, s = self.vp, self.plan, self.slot
        kw = dict(side_eps=p.eps)
        if s < 3:
            name = ("q_proj", "k_proj", "v_proj")[s]
            return dict(
                side_x=self.xw, side_w=vp[name]["kernel"],
                side_ln=(vp["layer_norm1"]["scale"],
                         vp["layer_norm1"]["bias"]),
                side_b=vp[name]["bias"], **kw,
            )
        if s == 3:
            att = self._glue()
            return dict(
                side_x=att, side_w=vp["out_proj"]["kernel"],
                side_b=vp["out_proj"]["bias"], side_residual=self.xw,
                **kw,
            )
        if s < 4 + p.n_fc1:
            i = s - 4
            return dict(
                side_x=self.x2, side_w=self._slice1(vp["fc1"]["kernel"], i),
                side_ln=(vp["layer_norm2"]["scale"],
                         vp["layer_norm2"]["bias"]),
                side_b=jax.lax.slice_in_dim(
                    vp["fc1"]["bias"], i * p.d, (i + 1) * p.d, axis=0
                ),
                **kw,
            )
        i = s - 4 - p.n_fc1
        return dict(
            side_x=self.h[i], side_w=self._slice0(vp["fc2"]["kernel"], i),
            side_act=p.act,
            side_b=vp["fc2"]["bias"] if i == 0 else None,
            side_residual=self.acc, **kw,
        )

    def take(self, so: jax.Array):
        s, p = self.slot, self.plan
        self.slot += 1
        if s == 0:
            self.q = so
        elif s == 1:
            self.k = so
        elif s == 2:
            self.v = so
        elif s == 3:
            self.x2 = so
            self.acc = so          # fc2 residual chain starts at x2
        elif s < 4 + p.n_fc1:
            self.h.append(so)
        else:
            self.acc = so

    def result(self) -> jax.Array:
        assert self.slot == self.plan.slots_per_layer, (
            f"side schedule consumed {self.slot} of "
            f"{self.plan.slots_per_layer} slots"
        )
        return self.acc
