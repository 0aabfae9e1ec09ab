"""Tensor-parallel fused decode: shard_map'd weight-streaming kernels.

The fused decode kernels (ops/dense_stream.py, ops/decode_layer.py) are
`pallas_call`s with no GSPMD partitioning rules, so under model-axis
tensor parallelism they used to be gated OFF and decode fell back to
the einsum path (round-2 VERDICT #2). This module runs the stacked-
weight scan decode engine (models/scan_decode.py) INSIDE a
`jax.shard_map` over the mesh instead: every device executes the same
kernels on its LOCAL head / hidden-column shard, and the layer's two
row-parallel matmuls finish with an explicit `psum` over the `model`
axis — the classic Megatron decomposition, expressed with the same
Pallas kernels the single-chip path streams weights through, and with
the collectives riding ICI exactly where XLA would put them for the
einsum path.

Layout (per decoder layer, all families):
  column-parallel: q/k/v projections (local heads), MLP up/fc1/gate
                   (local hidden columns) — no communication;
  row-parallel:    attention out-projection and MLP down/fc2 — each
                   shard computes a PARTIAL (B, D) output (the kernels'
                   `residual=None` mode), then one psum per half (or
                   one per layer for parallel-residual families:
                   gptneox/gptj fold both halves into a single psum);
  replicated:      x, LayerNorm/RMSNorm params, tanh gates (linear in
                   the partials, so they stay in-kernel), row-parallel
                   per-out-channel int8 scales; row-parallel biases are
                   added once, after the psum.

Fused QKV weights (mpt [q|k|v] thirds, gptneox per-head [q,k,v]
interleave) are split into separate per-role stacks OUTSIDE the
shard_map (`split_fused_qkv`) so a plain last-axis `model` shard gives
every device whole heads; this costs one weight relayout per generate
call, not per token.

KV caches (self-attention and cached media K/V) shard on their head
axis; the batch shards over (replica, fsdp) when divisible. The vocab
head and embeddings stay outside on the einsum/GSPMD path (one big
matmul XLA already partitions well).

Replaced torch path: the reference's FSDP-wrapped eager decode
(open_flamingo/src/flamingo.py:202-301 wrapping, flamingo_lm.py
per-layer loop) — re-designed as explicit-collective SPMD rather than
parameter-gathering module wrappers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.decode_layer import attend_out_decode
from ..ops.dense_stream import fused_dense, fused_mlp
from .decoders.common import (
    DecoderConfig,
    LayerKV,
    alibi_slopes,
    apply_rope,
    apply_rope_interleaved,
    rope_cos_sin,
)
from .layers import LN_EPS
from .scan_decode import _b, _w

# stacked-kernel parents whose LAST axis shards over `model`
# (column-parallel; q_proj/k_proj/v_proj also cover the split fused
# stacks produced by split_fused_qkv)
_COL = {
    "q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
    "dense_h_to_4h", "fc1", "to_q", "fc_in",
}
# stacked-kernel parents whose IN axis shards over `model`
# (row-parallel): per-out-channel scales stay replicated (they commute
# with the partial-sum accumulation); biases are added post-psum.
_ROW = {
    "out_proj", "o_proj", "dense", "down_proj", "dense_4h_to_h",
    "fc2", "to_out", "fc_out",
}

_K2_NAME = {
    "mpt": "up_proj", "gptneox": "dense_h_to_4h", "llama": "gate_proj",
    "gptj": "fc_in", "opt": "fc1",
}

# test hook: set True (at trace time) whenever the TP engine actually
# runs — lets the exact-token tests assert they did not silently fall
# back to the einsum path
_ENGAGED = False
_FUSED_QKV = {"mpt": "Wqkv", "gptneox": "query_key_value"}


def _deinterleave_qkv(arr, heads: int, axis: int):
    """gptneox layout: last axis is per-head [q|k|v] blocks of Dh.
    Returns (q, k, v) with last axis H*Dh."""
    shape = arr.shape
    n = shape[axis]
    dh = n // (3 * heads)
    a = arr.reshape(*shape[:axis], heads, 3, dh)
    outs = []
    for i in range(3):
        outs.append(
            jnp.take(a, i, axis=axis + 1).reshape(*shape[:axis], heads * dh)
        )
    return tuple(outs)


def split_fused_qkv(cfg: DecoderConfig, groups: Dict, qgroups: Optional[Dict]):
    """Replace each block's fused QKV stack with separate
    q_proj/k_proj/v_proj stacks (kernel/bias and the int8 side-car), so
    a last-axis `model` shard holds whole heads. Pure relayout — runs
    outside shard_map, once per generate call."""
    name = _FUSED_QKV.get(cfg.family)
    if name is None:
        return groups, qgroups
    nh = cfg.num_heads

    def split(arr, axis):
        if cfg.family == "mpt":
            return tuple(jnp.split(arr, 3, axis=axis))
        return _deinterleave_qkv(arr, nh, axis % arr.ndim)

    groups = dict(groups)
    qgroups = dict(qgroups) if qgroups else None
    for key in list(groups):
        if not key.startswith("block_"):
            continue
        p = dict(groups[key])
        fused = dict(p.pop(name))
        parts = {"q_proj": {}, "k_proj": {}, "v_proj": {}}
        for leaf, arr in fused.items():
            ax = arr.ndim - 1  # kernel (G,D,3N) and bias (G,3N): last
            for role, piece in zip(parts, split(arr, ax)):
                parts[role][leaf] = piece
        p.update(parts)
        groups[key] = p
        if qgroups and key in qgroups and name in qgroups[key]:
            qp = dict(qgroups[key])
            qf = dict(qp.pop(name))
            qparts = {"q_proj": {}, "k_proj": {}, "v_proj": {}}
            for leaf, arr in qf.items():
                ax = arr.ndim - 1
                for role, piece in zip(qparts, split(arr, ax)):
                    qparts[role][leaf] = piece
            qp.update(qparts)
            qgroups[key] = qp
    return groups, qgroups


def _group_specs(groups: Any) -> Any:
    """PartitionSpec pytree for a (split) stacked groups tree: column-
    parallel stacks shard their out axis, row-parallel their in axis,
    everything else replicates."""

    def spec(path, x):
        names = [str(getattr(k, "key", k)) for k in path]
        leaf = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        if parent in _COL:
            if leaf in ("kernel", "kernel_q"):
                return P(None, None, "model")
            if leaf in ("kernel_s", "bias"):
                return P(None, "model")
        if parent in _ROW and leaf in ("kernel", "kernel_q"):
            return P(None, "model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, groups)


def tp_ready(
    cfg: DecoderConfig,
    tq: int,
    cache,
    media,
    media_cache,
    groups: Optional[Dict],
) -> bool:
    """True when the shard_map'd TP fused decode engine can run: model-
    axis-sharded params, an ambient mesh, single-token decode against a
    stacked cache, and every sharded dimension divisible by the TP
    degree. Falls back (caller keeps the einsum path) otherwise."""
    from ..ops import dense_stream as ds

    if not ds._MODEL_SHARDED:
        return False
    if tq != 1 or cache is None or not cache.stacked or groups is None:
        return False
    if cache.layers[0].int8:
        # int8 caches are a single-chip scan-engine feature for now
        # (generation.py gates int8_kv off under model sharding anyway)
        return False
    if media is not None and media_cache is None:
        return False
    if not (jax.default_backend() == "tpu" or ds.FORCE_FUSED):
        return False
    if not ds.fused_head_dim_ok(cfg.head_dim):
        return False
    try:
        mesh = jax.sharding.get_abstract_mesh()
        tp = dict(mesh.shape).get("model", 1)
    except Exception:
        return False
    if tp <= 1:
        return False
    if cfg.num_heads % tp or cfg.kv_heads % tp:
        return False
    k2 = groups["block_0"][_K2_NAME[cfg.family]]["kernel"].shape[-1]
    if k2 % tp:
        return False
    if media is not None:
        if "xattn" not in groups:
            return False
        inner = groups["xattn"]["attn"]["to_q"]["kernel"].shape[-1]
        if (inner // 64) % tp:
            return False
    return True


def _qkv_proj(x2, p, qp, names, ln, dtype, li, clip=None, norm="layer"):
    """Three column-parallel LN+projection launches (local heads)."""
    outs = []
    for nm in names:
        w, s = _w(p, qp, nm, dtype)
        outs.append(fused_dense(
            x2, w, w_scale=s, bias=_b(p, nm),
            ln_scale=ln[0], ln_bias=ln[1], eps=ln[2], norm=norm,
            clip=clip, layer_idx=li,
        ))
    return outs


def _psum(y):
    return jax.lax.psum(y, "model")


def _bias_i(p, name, li):
    """Layer li's row of a stacked (G, N) bias, or None."""
    b = _b(p, name)
    return None if b is None else b[li].astype(jnp.float32)


def _tp_block_decode(cfg, x2, attn, kv, li, p, qp, dtype):
    """One decoder block, TP-local: mirrors scan_decode._block_decode
    but with separate per-role projections, partial row-parallel
    outputs, and explicit psums."""
    b = x2.shape[0]
    dh = cfg.head_dim
    fam = cfg.family
    d = cfg.hidden_size

    if fam == "mpt":
        nh_loc = p["Wqkv" if "Wqkv" in p else "q_proj"]["kernel"].shape[-1] // dh
        slopes = jnp.asarray(alibi_slopes(cfg.num_heads, cfg.alibi_bias_max),
                             jnp.float32)
        idx = jax.lax.axis_index("model")
        sl_loc = jax.lax.dynamic_slice_in_dim(slopes, idx * nh_loc, nh_loc)
        ln1 = (p["norm_1"]["scale"],
               p["norm_1"].get("bias") if not cfg.ln_no_bias else None,
               cfg.layer_norm_eps)
        q, k, v = _qkv_proj(
            x2, p, qp, ("q_proj", "k_proj", "v_proj"), ln1, dtype, li,
            clip=cfg.clip_qkv,
        )
        w_o, s_o = _w(p, qp, "out_proj", dtype)
        att_p, kc, vc = attend_out_decode(
            q.reshape(b, nh_loc, dh), kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh_loc, dh, d), scale=dh**-0.5,
            k_new=k.reshape(b, nh_loc, dh), v_new=v.reshape(b, nh_loc, dh),
            slot=attn.kv_slot, slopes=sl_loc, wout_scale=s_o, layer_idx=li,
        )
        x2 = x2 + _psum(att_p)
        w_up, s_up = _w(p, qp, "up_proj", dtype)
        w_dn, s_dn = _w(p, qp, "down_proj", dtype)
        mlp_p = fused_mlp(
            x2, w_up, w_dn, w1_scale=s_up, w2_scale=s_dn,
            ln_scale=p["norm_2"]["scale"],
            ln_bias=p["norm_2"].get("bias") if not cfg.ln_no_bias else None,
            eps=cfg.layer_norm_eps, act="gelu", layer_idx=li,
        )
        return x2 + _psum(mlp_p), LayerKV(k=kc, v=vc)

    if fam == "gptneox":
        nh_loc = p["q_proj"]["kernel"].shape[-1] // dh
        rotary_ndims = int(dh * cfg.rotary_pct)
        ln1 = (p["input_layernorm"]["scale"], p["input_layernorm"]["bias"],
               cfg.layer_norm_eps)
        q, k, v = _qkv_proj(
            x2, p, qp, ("q_proj", "k_proj", "v_proj"), ln1, dtype, li,
        )
        q = q.reshape(b, nh_loc, dh)
        k = k.reshape(b, nh_loc, dh)
        v = v.reshape(b, nh_loc, dh)
        cos, sin = rope_cos_sin(attn.position_ids, rotary_ndims,
                                cfg.rope_theta)
        q, k = apply_rope(q[:, None], k[:, None], cos, sin)
        w_o, s_o = _w(p, qp, "dense", dtype)
        att_p, kc, vc = attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh_loc, dh, d), scale=dh**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_o, layer_idx=li,
        )
        w_up, s_up = _w(p, qp, "dense_h_to_4h", dtype)
        w_dn, s_dn = _w(p, qp, "dense_4h_to_h", dtype)
        b_out = _bias_i(p, "dense", li)
        b2 = _bias_i(p, "dense_4h_to_h", li)
        if cfg.use_parallel_residual:
            mlp_p = fused_mlp(
                x2, w_up, w_dn, w1_scale=s_up, w2_scale=s_dn,
                b1=_b(p, "dense_h_to_4h"),
                ln_scale=p["post_attention_layernorm"]["scale"],
                ln_bias=p["post_attention_layernorm"]["bias"],
                eps=cfg.layer_norm_eps, act="gelu", layer_idx=li,
            )
            y = x2 + _psum(att_p + mlp_p)  # one collective for both halves
            if b_out is not None:
                y = (y + b_out).astype(x2.dtype)
            if b2 is not None:
                y = (y + b2).astype(x2.dtype)
        else:
            x2a = x2 + _psum(att_p)
            if b_out is not None:
                x2a = (x2a + b_out).astype(x2.dtype)
            mlp_p = fused_mlp(
                x2a, w_up, w_dn, w1_scale=s_up, w2_scale=s_dn,
                b1=_b(p, "dense_h_to_4h"),
                ln_scale=p["post_attention_layernorm"]["scale"],
                ln_bias=p["post_attention_layernorm"]["bias"],
                eps=cfg.layer_norm_eps, act="gelu", layer_idx=li,
            )
            y = x2a + _psum(mlp_p)
            if b2 is not None:
                y = (y + b2).astype(x2.dtype)
        return y, LayerKV(k=kc, v=vc)

    if fam == "llama":
        nh_loc = p["q_proj"]["kernel"].shape[-1] // dh
        ln1 = (p["input_layernorm"]["scale"], None, cfg.layer_norm_eps)
        q, k, v = _qkv_proj(
            x2, p, qp, ("q_proj", "k_proj", "v_proj"), ln1, dtype, li,
            norm="rms",
        )
        hkv_loc = k.shape[-1] // dh
        q = q.reshape(b, nh_loc, dh)
        k = k.reshape(b, hkv_loc, dh)
        v = v.reshape(b, hkv_loc, dh)
        cos, sin = rope_cos_sin(attn.position_ids, dh, cfg.rope_theta)
        q, k = apply_rope(q[:, None], k[:, None], cos, sin)
        w_o, s_o = _w(p, qp, "o_proj", dtype)
        att_p, kc, vc = attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh_loc, dh, d), scale=dh**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_o, layer_idx=li,
        )
        x2 = x2 + _psum(att_p)
        w_g, s_g = _w(p, qp, "gate_proj", dtype)
        w_u, s_u = _w(p, qp, "up_proj", dtype)
        w_d, s_d = _w(p, qp, "down_proj", dtype)
        mlp_p = fused_mlp(
            x2, w_g, w_d, w1_gate=w_u,
            w1_scale=s_g, w2_scale=s_d, w1_gate_scale=s_u,
            ln_scale=p["post_attention_layernorm"]["scale"],
            eps=cfg.layer_norm_eps, norm="rms", act="silu", layer_idx=li,
        )
        return x2 + _psum(mlp_p), LayerKV(k=kc, v=vc)

    if fam == "gptj":
        nh_loc = p["q_proj"]["kernel"].shape[-1] // dh
        rotary_dim = cfg.rotary_dim or dh
        act_name = "gelu_new" if cfg.hidden_act == "gelu_new" else "gelu"
        ln1 = (p["ln_1"]["scale"], p["ln_1"]["bias"], cfg.layer_norm_eps)
        q, k, v = _qkv_proj(
            x2, p, qp, ("q_proj", "k_proj", "v_proj"), ln1, dtype, li,
        )
        q = q.reshape(b, nh_loc, dh)
        k = k.reshape(b, nh_loc, dh)
        v = v.reshape(b, nh_loc, dh)
        q, k = apply_rope_interleaved(
            q[:, None], k[:, None], attn.position_ids, rotary_dim,
            cfg.rope_theta,
        )
        w_o, s_o = _w(p, qp, "out_proj", dtype)
        att_p, kc, vc = attend_out_decode(
            q[:, 0], kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh_loc, dh, d), scale=dh**-0.5,
            k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
            wout_scale=s_o, layer_idx=li,
        )
        w_in, s_in = _w(p, qp, "fc_in", dtype)
        w_fo, s_fo = _w(p, qp, "fc_out", dtype)
        mlp_p = fused_mlp(
            x2, w_in, w_fo, w1_scale=s_in, w2_scale=s_fo,
            b1=_b(p, "fc_in"), act=act_name,
            ln_scale=p["ln_1"]["scale"], ln_bias=p["ln_1"]["bias"],
            eps=cfg.layer_norm_eps, layer_idx=li,
        )
        y = x2 + _psum(att_p + mlp_p)  # parallel residual: one psum
        b2 = _bias_i(p, "fc_out", li)
        if b2 is not None:
            y = (y + b2).astype(x2.dtype)
        return y, LayerKV(k=kc, v=vc)

    if fam == "opt":
        nh_loc = p["q_proj"]["kernel"].shape[-1] // dh
        ln1 = (p["self_attn_layer_norm"]["scale"],
               p["self_attn_layer_norm"]["bias"], cfg.layer_norm_eps)
        q, k, v = _qkv_proj(
            x2, p, qp, ("q_proj", "k_proj", "v_proj"), ln1, dtype, li,
        )
        w_o, s_o = _w(p, qp, "out_proj", dtype)
        att_p, kc, vc = attend_out_decode(
            q.reshape(b, nh_loc, dh), kv.k, kv.v, attn.pad_mask,
            w_o.reshape(-1, nh_loc, dh, d), scale=dh**-0.5,
            k_new=k.reshape(b, nh_loc, dh), v_new=v.reshape(b, nh_loc, dh),
            slot=attn.kv_slot, wout_scale=s_o, layer_idx=li,
        )
        x2 = x2 + _psum(att_p)
        b_out = _bias_i(p, "out_proj", li)
        if b_out is not None:
            x2 = (x2 + b_out).astype(q.dtype)
        w_1, s_1 = _w(p, qp, "fc1", dtype)
        w_2, s_2 = _w(p, qp, "fc2", dtype)
        mlp_p = fused_mlp(
            x2, w_1, w_2, w1_scale=s_1, w2_scale=s_2, b1=_b(p, "fc1"),
            ln_scale=p["final_layer_norm"]["scale"],
            ln_bias=p["final_layer_norm"]["bias"],
            eps=cfg.layer_norm_eps, act="relu", layer_idx=li,
        )
        y = x2 + _psum(mlp_p)
        b2 = _bias_i(p, "fc2", li)
        if b2 is not None:
            y = (y + b2).astype(q.dtype)
        return y, LayerKV(k=kc, v=vc)

    raise ValueError(f"unknown family {fam!r}")


def _tp_xattn_decode(x2, mkv, mask2d, li, xp, xqp, dtype):
    """Gated cross-attention block, TP-local: q/ff-up column-parallel,
    out/ff-down row-parallel, tanh gates in-kernel (linear in the
    partials), residuals added post-psum."""
    ap = xp["attn"]
    fp = xp["ff"]
    aqp = (xqp or {}).get("attn")
    fqp = (xqp or {}).get("ff")
    b = x2.shape[0]
    dim_head = 64
    w_q, s_q = _w(ap, aqp, "to_q", dtype)
    w_o, s_o = _w(ap, aqp, "to_out", dtype)
    h_loc = w_q.shape[-1] // dim_head
    d = w_o.shape[-1]
    q = fused_dense(
        x2, w_q, w_scale=s_q,
        ln_scale=ap["norm"]["scale"], ln_bias=ap["norm"]["bias"],
        eps=LN_EPS, layer_idx=li,
    )
    att_p = attend_out_decode(
        q.reshape(b, h_loc, dim_head), mkv.k, mkv.v, mask2d,
        w_o.reshape(-1, h_loc, dim_head, d), scale=dim_head**-0.5,
        gate=xp["attn_gate"], wout_scale=s_o, layer_idx=li,
    )
    x2 = x2 + _psum(att_p)
    w_1, s_1 = _w(fp, fqp, "fc1", dtype)
    w_2, s_2 = _w(fp, fqp, "fc2", dtype)
    mlp_p = fused_mlp(
        x2, w_1, w_2, w1_scale=s_1, w2_scale=s_2,
        ln_scale=fp["norm"]["scale"], ln_bias=fp["norm"]["bias"],
        eps=LN_EPS, act="gelu", gate=xp["ff_gate"], layer_idx=li,
    )
    return x2 + _psum(mlp_p)


def tp_scan_fused_decode(
    cfg: DecoderConfig,
    x: jax.Array,                 # (B, 1, D) embedded current token
    attn,
    cache,
    text_time: Optional[jax.Array],
    groups: Dict[str, Any],
    qgroups: Optional[Dict[str, Any]],
    n: int,
    t_img: int,
    n_latents: int,
    dtype,
) -> Tuple[jax.Array, list]:
    """shard_map'd counterpart of scan_decode.scan_fused_decode. Same
    contract: (x (B, 1, D), new stacked LayerKV list, len n)."""
    global _ENGAGED
    _ENGAGED = True
    mesh = jax.sharding.get_abstract_mesh()
    num_layers = cfg.num_layers
    assert num_layers % n == 0
    g_groups = num_layers // n
    has_xattn = cache.media is not None

    groups, qgroups = split_fused_qkv(cfg, groups, qgroups)

    B = x.shape[0]
    dp_axes = tuple(
        a for a in ("replica", "fsdp") if dict(mesh.shape).get(a, 1) > 1
    )
    dp = 1
    for a in dp_axes:
        dp *= dict(mesh.shape)[a]
    bspec = dp_axes if (dp_axes and B % dp == 0) else None

    kv_spec = LayerKV(
        k=P(None, bspec, "model", None, None),
        v=P(None, bspec, "model", None, None),
    )
    in_specs = (
        P(bspec, None),                       # x2 (B, D)
        P(bspec, None),                       # pad_mask (B, S)
        P(bspec, None),                       # position_ids (B, 1)
        P(),                                  # kv_slot
        P(bspec, None) if text_time is not None else None,
        tuple(kv_spec for _ in cache.layers),  # self-attn caches
        kv_spec if has_xattn else None,        # cached media K/V
        _group_specs(groups),
        _group_specs(qgroups) if qgroups else None,
    )
    out_specs = (
        P(bspec, None),
        tuple(kv_spec for _ in cache.layers),
    )

    def body(x2, pad_mask, position_ids, kv_slot, ttime, layers, mkv,
             grp, qgrp):
        from types import SimpleNamespace

        # fresh container from the MAPPED args only — the outer
        # AttnInputs' arrays must not leak into the body as closures
        attn_loc = SimpleNamespace(
            pad_mask=pad_mask, position_ids=position_ids, kv_slot=kv_slot,
        )
        if mkv is not None:
            media_time = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (t_img, n_latents), 0
                ).reshape(-1) + 1
            )
            mask2d = ttime[:, :1] == media_time[None, :]
        else:
            mask2d = None

        def scan_body(carry, li):
            x2, kvs = carry
            new_kvs = list(kvs)
            for k in range(n):
                if k == n - 1 and mkv is not None:
                    x2 = _tp_xattn_decode(
                        x2, mkv, mask2d, li,
                        grp["xattn"], (qgrp or {}).get("xattn"), dtype,
                    )
                x2, new_kvs[k] = _tp_block_decode(
                    cfg, x2, attn_loc, kvs[k], li,
                    grp[f"block_{k}"], (qgrp or {}).get(f"block_{k}"),
                    dtype,
                )
            return (x2, tuple(new_kvs)), None

        (x2, new_layers), _ = jax.lax.scan(
            scan_body, (x2, tuple(layers)),
            jnp.arange(g_groups, dtype=jnp.int32),
        )
        return x2, new_layers

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata, so the per-value replication checker cannot see through
    # the kernels; correctness is held by the exact-token parity test
    x2, new_layers = jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(
        x[:, 0], attn.pad_mask, attn.position_ids, attn.kv_slot,
        text_time, tuple(cache.layers),
        cache.media[0] if has_xattn else None,
        groups, qgroups,
    )
    return x2[:, None], list(new_layers)
