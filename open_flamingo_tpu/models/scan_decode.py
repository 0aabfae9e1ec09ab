"""Stacked-weight scan decode engine: O(1)-compile AND unrolled-speed.

Round 2's lax.scan decode (flax nn.scan over layer groups) compiled in
O(1) depth but ran 2.4x slower than the unrolled layout: flax-scan
slices each layer's params out of the stacked arrays (dynamic-slice ->
materialized copy) before the Pallas kernels can read them, doubling
the weight traffic of a DMA-bound loop (CLAUDE.md round-2 notes).

This engine runs the decode layer loop as a manual lax.scan whose body
calls the fused weight-streaming kernels DIRECTLY with the full stacked
weight arrays (loop-invariant — never sliced) plus the layer index as a
scalar-prefetch operand; the kernels' block index maps address layer
`i`'s blocks straight from HBM. Per-step weight DMA is identical to the
unrolled layout; compile cost is one body trace.

KV caches and the cached media K/V remain lax.scan xs/ys slices (small
next to the weights; the in-place aliased slot-write keeps their
traffic at one stream per step).

Replaced torch path: HF's per-layer decode modules driven by
open_flamingo/src/flamingo.py:124-175 generate(); the scan layout
itself replaces the reference's eager per-layer Python loop
(flamingo_lm.py:110-126) with a compile-time-bounded idiom.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.decode_layer import attend_out_decode, attn_block_decode
from ..ops.dense_stream import fused_dense, fused_mlp
from .decoders.common import (
    AttnInputs,
    DecoderConfig,
    KVCache,
    LayerKV,
    alibi_slopes,
    apply_rope,
    apply_rope_interleaved,
    rope_cos_sin,
)
from .layers import LN_EPS


def _w(p: Dict, qp: Optional[Dict], name: str, dtype):
    """(stacked weight, stacked scale|None) for a PDense child `name`:
    int8 + per-out-channel scales when the qparams side-car has them."""
    if qp is not None and name in qp and "kernel_q" in qp[name]:
        return qp[name]["kernel_q"], qp[name]["kernel_s"]
    return p[name]["kernel"].astype(dtype), None


def _b(p: Dict, name: str):
    sub = p.get(name, {})
    return sub.get("bias")


def _unpack_kv(res, int8: bool):
    """(out, new LayerKV) from an updating attend kernel call — the
    int8-cache variant returns the scale planes too."""
    if int8:
        y, kc, vc, ksc, vsc = res
        return y, LayerKV(k=kc, v=vc, k_s=ksc, v_s=vsc)
    y, kc, vc = res
    return y, LayerKV(k=kc, v=vc)


class _SideHook:
    """Hands absorbed-ViT side tiles to carrier launches in program
    order (models/absorb_vit.py VitSideFeed); pad slots return None
    once the layer's tiles are consumed. `attn` mirrors
    plan.attn_carriers: attention-block launches also carry tiles —
    make_plan counted them in the slot schedule."""

    def __init__(self, feed, spl: int, attn: bool):
        self.feed, self.spl, self.attn = feed, spl, attn

    def kw(self):
        if self.feed.slot >= self.spl:
            return None
        return self.feed.kwargs()

    def attn_kw(self):
        return self.kw() if self.attn else None

    def take(self, so):
        if so is not None:
            self.feed.take(so)

    def result(self):
        return self.feed.result()


def _mlp(hook: Optional[_SideHook], *args, **kw):
    """fused_mlp carrying the hook's next absorbed-ViT side tile (when
    one is due); the side output feeds back into the hook."""
    skw = hook.kw() if hook is not None else None
    if skw:
        y, so = fused_mlp(*args, **kw, **skw)
        hook.take(so)
        return y
    return fused_mlp(*args, **kw)


def _attn_side(hook: Optional[_SideHook], res, akw):
    """Strip + route the side output of an attention-block launch that
    carried a tile (attn_block_decode appends it last)."""
    if akw:
        hook.take(res[-1])
        return res[:-1]
    return res


def _block_decode(
    cfg: DecoderConfig, x2, attn: AttnInputs, kv: LayerKV, li,
    p: Dict, qp: Optional[Dict], dtype, hook: Optional[_SideHook] = None,
) -> Tuple[jax.Array, LayerKV]:
    """One decoder block's fused decode with stacked weights — mirrors
    the per-family `use_fused_decode` branches in models/decoders/*.py
    (same kernels, layer_idx-indexed). `hook` rides absorbed-ViT tiles
    on the MLP launch and (mpt, hook.attn) the attention-block launch;
    side outputs route back through the hook. Returns (y, new_kv)."""
    b = x2.shape[0]
    d = cfg.hidden_size
    hd = cfg.head_dim
    nh = cfg.num_heads
    fam = cfg.family

    if fam == "mpt":
        from ..ops import fused_layer

        slopes = alibi_slopes(nh, cfg.alibi_bias_max)
        w_qkv, s_qkv = _w(p, qp, "Wqkv", dtype)
        w_out, s_out = _w(p, qp, "out_proj", dtype)
        w_up, s_up = _w(p, qp, "up_proj", dtype)
        w_down, s_down = _w(p, qp, "down_proj", dtype)
        ln1b = p["norm_1"].get("bias") if not cfg.ln_no_bias else None
        ln2b = p["norm_2"].get("bias") if not cfg.ln_no_bias else None
        if not fused_layer.DISABLE and not kv.int8 and hook is None:
            y, kc, vc = fused_layer.fused_layer_decode(
                x2, p["norm_1"]["scale"], ln1b,
                w_qkv, w_out, kv.k, kv.v, attn.pad_mask,
                w_up, w_down, p["norm_2"]["scale"], ln2b,
                heads=nh, head_dim=hd, scale=hd**-0.5, act="gelu",
                fused_qkv=True, slot=attn.kv_slot, slopes=slopes,
                clip=cfg.clip_qkv,
                wq_scale=s_qkv, wout_scale=s_out,
                w1_scale=s_up, w2_scale=s_down,
                eps=cfg.layer_norm_eps, layer_idx=li,
            )
            return y, LayerKV(k=kc, v=vc)
        akw = hook.attn_kw() if hook is not None else None
        x2, new_kv = _unpack_kv(_attn_side(hook, attn_block_decode(
            x2,
            p["norm_1"]["scale"],
            ln1b,
            w_qkv, w_out, kv.k, kv.v, attn.pad_mask,
            heads=nh, head_dim=hd, scale=hd**-0.5,
            fused_qkv=True, slot=attn.kv_slot, slopes=slopes,
            clip=cfg.clip_qkv, eps=cfg.layer_norm_eps,
            wq_scale=s_qkv, wout_scale=s_out, layer_idx=li,
            k_scale=kv.k_s, v_scale=kv.v_s,
            **(akw or {}),
        ), akw), kv.int8)
        y = _mlp(
            hook,
            x2, w_up, w_down, w1_scale=s_up, w2_scale=s_down,
            ln_scale=p["norm_2"]["scale"],
            ln_bias=ln2b,
            eps=cfg.layer_norm_eps, act="gelu", residual=x2, layer_idx=li,
        )
        return y, new_kv

    if fam == "gptneox":
        rotary_ndims = int(hd * cfg.rotary_pct)
        w_qkv, s_qkv = _w(p, qp, "query_key_value", dtype)
        w_out, s_out = _w(p, qp, "dense", dtype)
        w_up, s_up = _w(p, qp, "dense_h_to_4h", dtype)
        w_down, s_down = _w(p, qp, "dense_4h_to_h", dtype)
        has_bias = cfg.attention_bias
        qkv = fused_dense(
            x2, w_qkv, w_scale=s_qkv,
            bias=_b(p, "query_key_value") if has_bias else None,
            ln_scale=p["input_layernorm"]["scale"],
            ln_bias=p["input_layernorm"]["bias"],
            eps=cfg.layer_norm_eps, layer_idx=li,
        )
        qkv = qkv.reshape(b, nh, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        cos, sin = rope_cos_sin(attn.position_ids, rotary_ndims,
                                cfg.rope_theta)
        q, k = apply_rope(q[:, None], k[:, None], cos, sin)
        attn_out, new_kv = _unpack_kv(attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_out.reshape(-1, nh, hd, d),
            scale=hd**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_out,
            bias=_b(p, "dense") if has_bias else None,
            layer_idx=li,
            k_scale=kv.k_s, v_scale=kv.v_s,
        ), kv.int8)
        mlp_in = x2 if cfg.use_parallel_residual else x2 + attn_out
        y = _mlp(
            hook,
            mlp_in, w_up, w_down, w1_scale=s_up, w2_scale=s_down,
            b1=_b(p, "dense_h_to_4h") if has_bias else None,
            b2=_b(p, "dense_4h_to_h") if has_bias else None,
            ln_scale=p["post_attention_layernorm"]["scale"],
            ln_bias=p["post_attention_layernorm"]["bias"],
            eps=cfg.layer_norm_eps, act="gelu",
            residual=x2 + attn_out, layer_idx=li,
        )
        return y, new_kv

    if fam == "llama":
        h_kv = cfg.kv_heads
        ln_kw = dict(eps=cfg.layer_norm_eps, norm="rms", layer_idx=li)
        w_q, s_q = _w(p, qp, "q_proj", dtype)
        w_k, s_k = _w(p, qp, "k_proj", dtype)
        w_v, s_v = _w(p, qp, "v_proj", dtype)
        w_o, s_o = _w(p, qp, "o_proj", dtype)
        ln1 = p["input_layernorm"]["scale"]
        q = fused_dense(x2, w_q, w_scale=s_q, ln_scale=ln1, **ln_kw)
        k = fused_dense(x2, w_k, w_scale=s_k, ln_scale=ln1, **ln_kw)
        v = fused_dense(x2, w_v, w_scale=s_v, ln_scale=ln1, **ln_kw)
        q = q.reshape(b, nh, hd)
        k = k.reshape(b, h_kv, hd)
        v = v.reshape(b, h_kv, hd)
        cos, sin = rope_cos_sin(attn.position_ids, hd, cfg.rope_theta)
        q, k = apply_rope(q[:, None], k[:, None], cos, sin)
        x2, new_kv = _unpack_kv(attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh, hd, d),
            scale=hd**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_o, residual=x2, layer_idx=li,
            k_scale=kv.k_s, v_scale=kv.v_s,
        ), kv.int8)
        w_gate, s_gate = _w(p, qp, "gate_proj", dtype)
        w_up, s_up = _w(p, qp, "up_proj", dtype)
        w_down, s_down = _w(p, qp, "down_proj", dtype)
        y = _mlp(
            hook,
            x2, w_gate, w_down, w1_gate=w_up,
            w1_scale=s_gate, w2_scale=s_down, w1_gate_scale=s_up,
            ln_scale=p["post_attention_layernorm"]["scale"],
            eps=cfg.layer_norm_eps, norm="rms", act="silu",
            residual=x2, layer_idx=li,
        )
        return y, new_kv

    if fam == "gptj":
        rotary_dim = cfg.rotary_dim or hd
        act_name = "gelu_new" if cfg.hidden_act == "gelu_new" else "gelu"
        ln_kw = dict(
            ln_scale=p["ln_1"]["scale"], ln_bias=p["ln_1"]["bias"],
            eps=cfg.layer_norm_eps, layer_idx=li,
        )
        w_q, s_q = _w(p, qp, "q_proj", dtype)
        w_k, s_k = _w(p, qp, "k_proj", dtype)
        w_v, s_v = _w(p, qp, "v_proj", dtype)
        w_o, s_o = _w(p, qp, "out_proj", dtype)
        w_in, s_in = _w(p, qp, "fc_in", dtype)
        w_fo, s_fo = _w(p, qp, "fc_out", dtype)
        q = fused_dense(x2, w_q, w_scale=s_q, **ln_kw)
        k = fused_dense(x2, w_k, w_scale=s_k, **ln_kw)
        v = fused_dense(x2, w_v, w_scale=s_v, **ln_kw)
        q = q.reshape(b, nh, hd)
        k = k.reshape(b, nh, hd)
        v = v.reshape(b, nh, hd)
        q, k = apply_rope_interleaved(
            q[:, None], k[:, None], attn.position_ids, rotary_dim,
            cfg.rope_theta,
        )
        attn_out, new_kv = _unpack_kv(attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh, hd, d),
            scale=hd**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_o, layer_idx=li,
            k_scale=kv.k_s, v_scale=kv.v_s,
        ), kv.int8)
        y = _mlp(
            hook,
            x2, w_in, w_fo, w1_scale=s_in, w2_scale=s_fo,
            b1=_b(p, "fc_in"), b2=_b(p, "fc_out"),
            act=act_name, residual=x2 + attn_out, **ln_kw,
        )
        return y, new_kv

    if fam == "opt":
        ln_kw = dict(
            ln_scale=p["self_attn_layer_norm"]["scale"],
            ln_bias=p["self_attn_layer_norm"]["bias"],
            eps=cfg.layer_norm_eps, layer_idx=li,
        )
        w_q, s_q = _w(p, qp, "q_proj", dtype)
        w_k, s_k = _w(p, qp, "k_proj", dtype)
        w_v, s_v = _w(p, qp, "v_proj", dtype)
        w_o, s_o = _w(p, qp, "out_proj", dtype)
        w_1, s_1 = _w(p, qp, "fc1", dtype)
        w_2, s_2 = _w(p, qp, "fc2", dtype)
        q = fused_dense(x2, w_q, w_scale=s_q, bias=_b(p, "q_proj"), **ln_kw)
        k = fused_dense(x2, w_k, w_scale=s_k, bias=_b(p, "k_proj"), **ln_kw)
        v = fused_dense(x2, w_v, w_scale=s_v, bias=_b(p, "v_proj"), **ln_kw)
        x2, new_kv = _unpack_kv(attend_out_decode(
            q.reshape(b, nh, hd), kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh, hd, d),
            scale=hd**-0.5,
            k_new=k.reshape(b, nh, hd), v_new=v.reshape(b, nh, hd),
            slot=attn.kv_slot,
            wout_scale=s_o, bias=_b(p, "out_proj"), residual=x2,
            layer_idx=li,
            k_scale=kv.k_s, v_scale=kv.v_s,
        ), kv.int8)
        y = _mlp(
            hook,
            x2, w_1, w_2, w1_scale=s_1, w2_scale=s_2,
            b1=_b(p, "fc1"), b2=_b(p, "fc2"),
            ln_scale=p["final_layer_norm"]["scale"],
            ln_bias=p["final_layer_norm"]["bias"],
            eps=cfg.layer_norm_eps, act="relu", residual=x2, layer_idx=li,
        )
        return y, new_kv

    raise ValueError(f"unknown family {fam!r}")


def _xattn_decode(
    x2, mkv: LayerKV, mask2d, li, xp: Dict, xqp: Optional[Dict], dtype,
    hook: Optional[_SideHook] = None,
) -> jax.Array:
    """Gated cross-attention fused decode with stacked weights —
    mirrors GatedCrossAttentionBlock's fused branch (models/xattn.py).
    `hook` rides absorbed-ViT tiles on the ff launch and (hook.attn)
    the attend launch; side outputs route back through the hook."""
    from ..ops import fused_layer

    ap = xp["attn"]
    fp = xp["ff"]
    aqp = (xqp or {}).get("attn")
    fqp = (xqp or {}).get("ff")
    w_q, s_q = _w(ap, aqp, "to_q", dtype)
    w_o, s_o = _w(ap, aqp, "to_out", dtype)
    inner = w_o.shape[-2]
    dim_head = 64
    heads = inner // dim_head
    w_1, s_1 = _w(fp, fqp, "fc1", dtype)
    w_2, s_2 = _w(fp, fqp, "fc2", dtype)
    if fused_layer.use_for_xattn() and not mkv.int8 and hook is None:
        return fused_layer.fused_layer_decode(
            x2, ap["norm"]["scale"], ap["norm"]["bias"],
            w_q, w_o, mkv.k, mkv.v, mask2d,
            w_1, w_2, fp["norm"]["scale"], fp["norm"]["bias"],
            heads=heads, head_dim=dim_head, scale=dim_head**-0.5,
            act="gelu", gate=xp["attn_gate"], gate2=xp["ff_gate"],
            wq_scale=s_q, wout_scale=s_o,
            w1_scale=s_1, w2_scale=s_2,
            eps=LN_EPS, layer_idx=li,
        )
    akw = hook.attn_kw() if hook is not None else None
    y = attn_block_decode(
        x2, ap["norm"]["scale"], ap["norm"]["bias"],
        w_q, w_o, mkv.k, mkv.v, mask2d,
        heads=heads, head_dim=dim_head, scale=dim_head**-0.5,
        gate=xp["attn_gate"], eps=LN_EPS,
        wq_scale=s_q, wout_scale=s_o, layer_idx=li,
        k_scale=mkv.k_s, v_scale=mkv.v_s,
        **(akw or {}),
    )
    if akw:
        y, so = y
        hook.take(so)
    return _mlp(
        hook,
        y, w_1, w_2, w1_scale=s_1, w2_scale=s_2,
        ln_scale=fp["norm"]["scale"], ln_bias=fp["norm"]["bias"],
        eps=LN_EPS, act="gelu", residual=y, gate=xp["ff_gate"],
        layer_idx=li,
    )


def scan_fused_decode(
    cfg: DecoderConfig,
    x: jax.Array,                 # (B, 1, D) embedded current token
    attn: AttnInputs,
    cache: KVCache,
    text_time: Optional[jax.Array],   # (B, 1) cached-media text time
    groups: Dict[str, Any],           # params["lm"]["groups"] (stacked)
    qgroups: Optional[Dict[str, Any]],
    n: int,                           # cross_attn_every_n group size
    t_img: int,
    n_latents: int,
    dtype,
    side=None,                        # (vp_step, xw, plan, interpret)
) -> Tuple[jax.Array, list]:
    """Run the full decode layer stack as lax.scan over layer groups.

    The KV caches arrive group-STACKED (KVCache scan layout) and travel
    through the scan CARRY; the kernels' block index maps read/write
    only layer li's blocks in place (aliased), so per-step cache traffic
    is exactly one stream + one slot write — no stack/unstack or
    per-layer slice copies anywhere.

    Returns (x (B, 1, D), new stacked LayerKV list, len n)."""
    num_layers = cfg.num_layers
    assert num_layers % n == 0
    g = num_layers // n
    x2 = x[:, 0]
    has_xattn = cache.media is not None
    assert cache.stacked, "scan decode needs KVCache.create(scan_groups=)"

    if has_xattn:
        mkv = cache.media[0]       # stacked (G, B, H, S_m, Dh), static
        media_time = (
            jax.lax.broadcasted_iota(jnp.int32, (t_img, n_latents), 0)
            .reshape(-1) + 1
        )
        mask2d = text_time[:, :1] == media_time[None, :]   # (B, S_m)
    else:
        mkv = None
        mask2d = None

    def body_plain(carry, li):
        x2, kvs = carry
        new_kvs = list(kvs)
        for k in range(n):
            if k == n - 1 and has_xattn:
                x2 = _xattn_decode(
                    x2, mkv, mask2d, li,
                    groups["xattn"], (qgroups or {}).get("xattn"),
                    dtype,
                )
            x2, new_kvs[k] = _block_decode(
                cfg, x2, attn, kvs[k], li,
                groups[f"block_{k}"], (qgroups or {}).get(f"block_{k}"),
                dtype,
            )
        return (x2, tuple(new_kvs)), None

    if side is None:
        (x2, new_layers), _ = jax.lax.scan(
            body_plain, (x2, tuple(cache.layers)),
            jnp.arange(g, dtype=jnp.int32),
        )
        return x2[:, None], list(new_layers)

    # --- absorbed-ViT macro scan (models/absorb_vit.py) ----------------
    # The first macro*per_step groups are re-blocked into macro
    # iterations carrying EXACTLY one ViT layer's side schedule each
    # (macro = ceil(slots_per_layer / carrier launches per group);
    # trailing launch positions past the slot count carry no tile) —
    # static slot placement, no lax.cond; the attention glue between
    # slots 2 and 3 serializes itself through data dependencies. With
    # plan.attn_carriers the attention-block launches (mpt self-attn +
    # the gated-xattn attend) also carry tiles — their KV-cache streams
    # are the largest per-grid-step DMA windows in a quantized decode
    # loop. The REMAINING groups run the plain body: spreading layers
    # across decode steps (small per_step) leaves those launches' DMA
    # windows to the main stream and keeps the side MXU under budget.
    from .absorb_vit import VitSideFeed

    vp_step, xw0, plan, interp = side
    assert has_xattn, "absorb schedule rides the xattn MLP launches"
    gs = plan.side_groups
    assert gs <= g and gs == plan.macro * plan.per_step, (g, plan)
    li_side = jnp.arange(gs, dtype=jnp.int32).reshape(
        plan.per_step, plan.macro
    )

    def body_side(carry, xs):
        x2, kvs, xw = carry
        li_vec, vp = xs
        # vp: {"p": layer params, "q": optional int8 side-car} (the
        # absorb_vit.side_step_tree layout), or a bare params tree
        if isinstance(vp, dict) and "p" in vp:
            vp = (vp["p"], vp.get("q"))
        feed = VitSideFeed(vp, xw, plan, interpret=interp)
        hook = _SideHook(
            feed, plan.slots_per_layer,
            getattr(plan, "attn_carriers", False),
        )
        new_kvs = list(kvs)
        for j in range(plan.macro):
            li = li_vec[j]
            for k in range(n):
                if k == n - 1:
                    x2 = _xattn_decode(
                        x2, mkv, mask2d, li,
                        groups["xattn"], (qgroups or {}).get("xattn"),
                        dtype, hook=hook,
                    )
                x2, new_kvs[k] = _block_decode(
                    cfg, x2, attn, new_kvs[k], li,
                    groups[f"block_{k}"], (qgroups or {}).get(f"block_{k}"),
                    dtype, hook=hook,
                )
        return (x2, tuple(new_kvs), hook.result()), None

    (x2, kvs, xw), _ = jax.lax.scan(
        body_side, (x2, tuple(cache.layers), xw0), (li_side, vp_step)
    )
    if gs < g:
        (x2, kvs), _ = jax.lax.scan(
            body_plain, (x2, kvs), jnp.arange(gs, g, dtype=jnp.int32)
        )
    return x2[:, None], list(kvs), xw
