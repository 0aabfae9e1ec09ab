"""Unified causal LM with interleaved gated cross-attention.

TPU-native replacement for the reference's runtime class-rebasing +
layer-surgery approach (open_flamingo/src/flamingo_lm.py): one Flax module
owns the decoder blocks of any supported family AND the gated xattn blocks
inserted every `cross_attn_every_n` layers; vision latents and media text
time are explicit forward arguments, decode state is an explicit KVCache
pytree. Layer i applies xattn (if present) before the decoder block,
matching FlamingoLayer.forward (flamingo_lm.py:39-66).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoders.common import DecoderConfig, KVCache, LayerKV, make_attn_inputs
from .decoders.gptj import GPTJBlock
from .decoders.gptneox import GPTNeoXBlock
from .decoders.llama import LlamaBlock, RMSNorm
from .decoders.mpt import MPTBlock
from .decoders.opt import OPTBlock
from .layers import PDense, PLayerNorm
from .xattn import GatedCrossAttentionBlock, build_media_masks, use_xattn_kernel

Dtype = Any

BLOCK_REGISTRY = {
    "mpt": MPTBlock,
    "gptneox": GPTNeoXBlock,
    "llama": LlamaBlock,
    "gptj": GPTJBlock,
    "opt": OPTBlock,
}


class FlamingoLayerGroup(nn.Module):
    """One homogeneous layer group for lax.scan: `group_size` decoder
    blocks with the gated xattn (if any) before the LAST block — xattn_i
    sits before block i where (i+1) % N == 0 (flamingo_lm.py:95-104)."""

    cfg: DecoderConfig
    vis_dim: Optional[int]
    group_size: int
    group_has_xattn: bool
    has_cache: bool
    only_attend_immediate_media: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    has_media_kv: bool = False

    @nn.compact
    def __call__(self, carry, xs):
        x, attn, media, text_time, media_mask, zero_rows = carry
        group_kv, media_kv = xs
        block_cls = BLOCK_REGISTRY[self.cfg.family]
        new_kv = []
        for k in range(self.group_size):
            if k == self.group_size - 1 and self.group_has_xattn:
                x = GatedCrossAttentionBlock(
                    dim=self.cfg.hidden_size,
                    dim_visual=self.vis_dim,
                    only_attend_immediate_media=self.only_attend_immediate_media,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name="xattn",
                )(
                    x, media, text_time,
                    (media_kv.k, media_kv.v) if self.has_media_kv else None,
                    media_mask, zero_rows,
                )
            layer_kv = group_kv[k] if self.has_cache else None
            x, kv = block_cls(
                cfg=self.cfg,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{k}",
            )(x, attn, layer_kv)
            new_kv.append(kv)
        out_kv = tuple(new_kv) if self.has_cache else group_kv
        return (x, attn, media, text_time, media_mask, zero_rows), out_kv


def stack_group_kv(layers, n: int):
    """Per-layer KVCache tuple (len G*n) -> tuple of n LayerKV stacked
    over the G groups (layer i = g*n + k)."""
    g = len(layers) // n
    return tuple(
        jax.tree.map(lambda *xs: jnp.stack(xs), *[layers[i * n + k] for i in range(g)])
        for k in range(n)
    )


def unstack_group_kv(stacked, g: int, n: int):
    out = []
    for gi in range(g):
        for k in range(n):
            out.append(jax.tree.map(lambda x: x[gi], stacked[k]))
    return tuple(out)


def extract_media_kv(variables: dict, scan_layers: bool):
    """Pull the media K/V sown by each MaskedCrossAttention out of a
    prefill `apply(..., mutable=["media_kv"])` call on a Flamingo model.

    Returns the tuple to store in KVCache.media:
      * unrolled: one LayerKV per xattn layer, in layer order;
      * scan:     a single LayerKV with a leading group axis (fed back to
                  nn.scan as a scanned input).
    Returns None if no xattn layer sowed anything (pure-LM model).
    """
    col = variables.get("media_kv", {}).get("lm")
    if not col:
        return None
    if scan_layers:
        k, v = col["groups"]["xattn"]["attn"]["kv"][0]
        return (LayerKV(k=k, v=v),)
    idx = sorted(
        int(name.split("_")[-1]) for name in col if name.startswith("xattn_")
    )
    return tuple(
        LayerKV(k=col[f"xattn_{i}"]["attn"]["kv"][0][0],
                v=col[f"xattn_{i}"]["attn"]["kv"][0][1])
        for i in idx
    )


def to_scanned_layout(lm_params: dict, num_layers: int, n: int) -> dict:
    """Per-layer param layout (blocks_{i}/xattn_{i}) -> scanned layout
    (groups/block_{k}, groups/xattn with leading group axis)."""
    import numpy as np

    g = num_layers // n
    groups: dict = {}
    for k in range(n):
        per = [lm_params[f"blocks_{gi * n + k}"] for gi in range(g)]
        groups[f"block_{k}"] = jax.tree.map(lambda *xs: np.stack(xs), *per)
    xkeys = [f"xattn_{gi * n + n - 1}" for gi in range(g)]
    if all(k in lm_params for k in xkeys):
        per = [lm_params[k] for k in xkeys]
        groups["xattn"] = jax.tree.map(lambda *xs: np.stack(xs), *per)
    rest = {
        k: v
        for k, v in lm_params.items()
        if not (k.startswith("blocks_") or k.startswith("xattn_"))
    }
    return {**rest, "groups": groups}


class FlamingoLM(nn.Module):
    """Decoder LM, optionally with gated cross-attention every N layers.

    With `cross_attn_every_n=None` this is a plain causal LM (used for
    HF parity tests). Init must be called with `media`/`text_time` when
    xattn layers are enabled so their params are created.

    scan_layers=True runs the layer stack as lax.scan over homogeneous
    groups (stacked params, compile time O(1) in depth — the TPU idiom);
    requires num_layers % cross_attn_every_n == 0. Convert per-layer
    params with `to_scanned_layout`.
    """

    cfg: DecoderConfig
    vis_dim: Optional[int] = None
    cross_attn_every_n: Optional[int] = None
    only_attend_immediate_media: bool = True
    # jax.checkpoint each decoder block + xattn block (the reference's
    # activation checkpointing, open_flamingo/train/train.py:368-381)
    remat: bool = False
    scan_layers: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def has_xattn(self, layer_idx: int) -> bool:
        n = self.cross_attn_every_n
        return n is not None and (layer_idx + 1) % n == 0

    def _can_scan_fused_decode(self, tq, cache, media, media_cache):
        """Stacked-weight decode engine preconditions: fused decode
        active, params exist (not initializing), xattn media K/V cached
        when media is present, and no GQA (llama n_rep>1)."""
        from ..ops.dense_stream import use_fused_decode

        if self.is_initializing() or not use_fused_decode(
            tq, cache is not None
        ):
            return False
        if not cache.stacked:
            # legacy per-layer cache (e.g. eval rank-classification):
            # flax-scan path handles it
            return False
        from ..ops.dense_stream import fused_head_dim_ok

        if not fused_head_dim_ok(self.cfg.head_dim):
            return False   # Mosaic shape-cast limit below Dh=64
        if media is not None and media_cache is None:
            return False
        return True

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        *,
        media: Optional[jax.Array] = None,
        text_time: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
        side=None,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        """
        input_ids:      (B, T) int32
        attention_mask: (B, T) 1/0; defaults to all ones
        media:          (B, T_img, n_latents, vis_dim) perceiver latents
        text_time:      (B, T) media-time of each text position (see xattn)
        cache:          KVCache for incremental decode
        side:           absorbed-ViT side schedule for this decode step
                        ((vp_step, xw, plan, interpret) — absorb_vit.py);
                        requires the stacked-weight scan decode engine
        Returns (logits (B, T, V) fp32, updated cache or None) — plus
        the new side workspace as a third element when `side` is given.
        """
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)

        attn, cache = make_attn_inputs(attention_mask, cache=cache)

        embed = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="wte",
        )
        x = embed(input_ids)
        if cfg.family == "opt":
            # learned positions with the OPT +2 offset; position_ids are
            # already mask-aware cumsum-1 (HF OPTLearnedPositionalEmbedding)
            pos_embed = nn.Embed(
                cfg.max_position_embeddings + 2,
                cfg.hidden_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="wpe",
            )
            x = x + pos_embed(attn.position_ids + 2)

        # media masks are layer-independent: build them ONCE here (not per
        # xattn layer) for the einsum dispatch; the Pallas kernel path
        # (multi-token prefill/training) builds the mask in-kernel instead.
        media_mask = zero_rows = None
        if media is not None and not use_xattn_kernel(
            input_ids.shape[1], self.only_attend_immediate_media
        ):
            media_mask, zero_rows = build_media_masks(
                text_time, media.shape[1], media.shape[2],
                self.only_attend_immediate_media,
            )
        media_cache = cache.media if cache is not None else None

        side_xw = None
        if side is not None:
            # absorbed-ViT side work is only legal on the stacked-weight
            # scan engine path — generation gates on the same conditions
            # (generation.py), so a mismatch here is a programming error
            assert self.scan_layers and self._can_scan_fused_decode(
                input_ids.shape[1], cache, media, media_cache
            ), "side absorption requires the scan fused decode engine"

        tp_decode_on = False
        if self.scan_layers and not self.is_initializing():
            from .tp_decode import tp_ready

            tp_decode_on = tp_ready(
                cfg, input_ids.shape[1], cache, media, media_cache,
                self.variables.get("params", {}).get("groups"),
            )
        if side is not None:
            assert not tp_decode_on, (
                "side absorption is not supported under tensor "
                "parallelism (the side tiles have no sharding rules)"
            )
        if tp_decode_on:
            # model-axis tensor parallelism: the same stacked-weight
            # engine, shard_map'd over the mesh with psum epilogues
            # (tp_decode.py) — fused kernels on local head/column shards
            from .tp_decode import tp_scan_fused_decode

            variables = self.variables
            x, new_layers = tp_scan_fused_decode(
                cfg,
                x,
                attn,
                cache,
                text_time,
                variables["params"]["groups"],
                variables.get("qparams", {}).get("groups"),
                self.cross_attn_every_n or 1,
                media.shape[1] if media is not None else 0,
                media.shape[2] if media is not None else 0,
                self.dtype,
            )
        elif self.scan_layers and self._can_scan_fused_decode(
            input_ids.shape[1], cache, media, media_cache
        ):
            # stacked-weight decode engine: kernels index the stacked
            # params directly (no per-layer dynamic-slice copies) —
            # O(1) compile at unrolled-layout speed (scan_decode.py)
            from .scan_decode import scan_fused_decode

            variables = self.variables
            res = scan_fused_decode(
                cfg,
                x,
                attn,
                cache,
                text_time,
                variables["params"]["groups"],
                variables.get("qparams", {}).get("groups"),
                self.cross_attn_every_n or 1,
                media.shape[1] if media is not None else 0,
                media.shape[2] if media is not None else 0,
                self.dtype,
                side=side,
            )
            if side is not None:
                x, new_layers, side_xw = res
            else:
                x, new_layers = res
        elif self.scan_layers:
            x, new_layers = self._scan_stack(
                x, attn, media, text_time, media_mask, zero_rows,
                cache, media_cache,
            )
        else:
            block_cls = BLOCK_REGISTRY[cfg.family]
            xattn_cls = GatedCrossAttentionBlock
            if self.remat:
                block_cls = nn.remat(block_cls)
                xattn_cls = nn.remat(xattn_cls)
            new_layers = []
            xattn_idx = 0
            for i in range(cfg.num_layers):
                if self.has_xattn(i) and (media is not None):
                    mkv = None
                    if media_cache is not None:
                        m = media_cache[xattn_idx]
                        mkv = (m.k, m.v)
                    xattn_idx += 1
                    x = xattn_cls(
                        dim=cfg.hidden_size,
                        dim_visual=self.vis_dim,
                        only_attend_immediate_media=self.only_attend_immediate_media,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"xattn_{i}",
                    )(x, media, text_time, mkv, media_mask, zero_rows)
                layer_kv = cache.layers[i] if cache is not None else None
                x, new_kv = block_cls(
                    cfg=cfg,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"blocks_{i}",
                )(x, attn, layer_kv)
                new_layers.append(new_kv)

        from ..ops.dense_stream import use_fused_decode

        norm_f = None
        if cfg.family == "llama":
            rms_f = RMSNorm(
                cfg.hidden_size,
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm_f",
            )
        else:
            norm_f = PLayerNorm(
                cfg.hidden_size,
                epsilon=cfg.layer_norm_eps,
                use_bias=not cfg.ln_no_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm_f",
            )
        head = None
        if not cfg.tie_word_embeddings:
            head = PDense(
                cfg.hidden_size,
                cfg.vocab_size,
                use_bias=cfg.lm_head_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lm_head",
            )

        bn = min(2048, cfg.vocab_size)  # ragged tail handled in-kernel
        if use_fused_decode(input_ids.shape[1], cache is not None):
            # decode: the final norm fuses into the vocab-projection
            # stream — for tied embeddings the (V, d) table streams
            # transposed, never materializing a (d, V) copy.
            from ..ops.dense_stream import fused_dense

            if norm_f is not None:
                ln_kw = dict(
                    ln_scale=norm_f.scale,
                    ln_bias=norm_f.bias if not cfg.ln_no_bias else None,
                    eps=cfg.layer_norm_eps,
                    block_n=bn,
                )
            else:
                ln_kw = dict(
                    ln_scale=rms_f.scale, eps=cfg.layer_norm_eps,
                    norm="rms", block_n=bn,
                )
            if cfg.tie_word_embeddings:
                if embed.has_variable("qparams", "embedding_q"):
                    w_e = embed.get_variable("qparams", "embedding_q")
                    s_e = embed.get_variable("qparams", "embedding_s")
                else:
                    w_e = embed.embedding.astype(self.dtype)
                    s_e = None
                logits = fused_dense(
                    x[:, 0], w_e, w_scale=s_e,
                    w_transposed=True, **ln_kw,
                )
            else:
                w_h, s_h = head.stream_weight()
                logits = fused_dense(
                    x[:, 0], w_h, w_scale=s_h,
                    bias=head.bias if cfg.lm_head_bias else None,
                    **ln_kw,
                )
            logits = logits[:, None]
        else:
            x = rms_f(x) if norm_f is None else norm_f(x)
            if cfg.tie_word_embeddings:
                logits = embed.attend(x)
            else:
                logits = head(x)
        logits = logits.astype(jnp.float32)

        if cache is not None:
            cache = cache.replace(
                layers=tuple(new_layers),
                index=cache.index + input_ids.shape[1],
            )
        if side is not None:
            return logits, cache, side_xw
        return logits, cache

    def _scan_stack(
        self, x, attn, media, text_time, media_mask, zero_rows, cache,
        media_cache,
    ):
        """Layer stack as lax.scan over homogeneous groups."""
        cfg = self.cfg
        n = self.cross_attn_every_n or 1
        assert cfg.num_layers % n == 0, (cfg.num_layers, n)
        g = cfg.num_layers // n
        has_xattn = self.cross_attn_every_n is not None and media is not None
        has_cache = cache is not None
        has_media_kv = media_cache is not None

        group_cls = FlamingoLayerGroup
        if self.remat:
            group_cls = nn.remat(
                group_cls, prevent_cse=False, static_argnums=()
            )
        scanned = nn.scan(
            group_cls,
            variable_axes={"params": 0, "media_kv": 0, "qparams": 0},
            split_rngs={"params": True},
            in_axes=0,
            out_axes=0,
            length=g,
        )(
            cfg=cfg,
            vis_dim=self.vis_dim,
            group_size=n,
            group_has_xattn=has_xattn,
            has_cache=has_cache,
            has_media_kv=has_media_kv,
            only_attend_immediate_media=self.only_attend_immediate_media,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="groups",
        )
        if has_cache:
            # stacked caches (KVCache.create(scan_groups=...)) pass
            # through; per-layer caches are stacked here (legacy path)
            group_kv = (
                cache.layers if cache.stacked
                else stack_group_kv(cache.layers, n)
            )
        else:
            group_kv = jnp.zeros((g, 1), jnp.int32)  # dummy scanned input
        # media K/V captured at prefill: a single LayerKV with a leading
        # group axis (see extract_media_kv), scanned alongside the cache.
        mkv = media_cache[0] if has_media_kv else jnp.zeros((g, 1), jnp.int32)
        if media is None:
            media = jnp.zeros(
                (x.shape[0], 1, 1, self.vis_dim or 1), self.dtype
            )
            text_time = jnp.zeros(x.shape[:2], jnp.int32)
        (x, _, _, _, _, _), ys = scanned(
            (x, attn, media, text_time, media_mask, zero_rows),
            (group_kv, mkv),
        )
        if has_cache:
            if cache.stacked:
                return x, list(ys)     # keep the stacked layout
            return x, list(unstack_group_kv(ys, g, n))
        return x, [None] * cfg.num_layers
