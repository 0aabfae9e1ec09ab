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

from .decoders.common import DecoderConfig, KVCache, make_attn_inputs
from .decoders.gptj import GPTJBlock
from .decoders.gptneox import GPTNeoXBlock
from .decoders.llama import LlamaBlock, RMSNorm
from .decoders.mpt import MPTBlock
from .decoders.opt import OPTBlock
from .xattn import GatedCrossAttentionBlock

Dtype = Any

BLOCK_REGISTRY = {
    "mpt": MPTBlock,
    "gptneox": GPTNeoXBlock,
    "llama": LlamaBlock,
    "gptj": GPTJBlock,
    "opt": OPTBlock,
}


class FlamingoLM(nn.Module):
    """Decoder LM, optionally with gated cross-attention every N layers.

    With `cross_attn_every_n=None` this is a plain causal LM (used for
    HF parity tests). Init must be called with `media`/`text_time` when
    xattn layers are enabled so their params are created.
    """

    cfg: DecoderConfig
    vis_dim: Optional[int] = None
    cross_attn_every_n: Optional[int] = None
    only_attend_immediate_media: bool = True
    # jax.checkpoint each decoder block + xattn block (the reference's
    # activation checkpointing, open_flamingo/train/train.py:368-381)
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def has_xattn(self, layer_idx: int) -> bool:
        n = self.cross_attn_every_n
        return n is not None and (layer_idx + 1) % n == 0

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        *,
        media: Optional[jax.Array] = None,
        text_time: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
    ) -> Tuple[jax.Array, Optional[KVCache]]:
        """
        input_ids:      (B, T) int32
        attention_mask: (B, T) 1/0; defaults to all ones
        media:          (B, T_img, n_latents, vis_dim) perceiver latents
        text_time:      (B, T) media-time of each text position (see xattn)
        cache:          KVCache for incremental decode
        Returns (logits (B, T, V) fp32, updated cache or None).
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

        block_cls = BLOCK_REGISTRY[cfg.family]
        xattn_cls = GatedCrossAttentionBlock
        if self.remat:
            block_cls = nn.remat(block_cls)
            xattn_cls = nn.remat(xattn_cls)
        new_layers = []
        for i in range(cfg.num_layers):
            if self.has_xattn(i) and (media is not None):
                x = xattn_cls(
                    dim=cfg.hidden_size,
                    dim_visual=self.vis_dim,
                    only_attend_immediate_media=self.only_attend_immediate_media,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"xattn_{i}",
                )(x, media, text_time)
            layer_kv = cache.layers[i] if cache is not None else None
            x, new_kv = block_cls(
                cfg=cfg,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x, attn, layer_kv)
            new_layers.append(new_kv)

        if cfg.family == "llama":
            x = RMSNorm(
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm_f",
            )(x)
        else:
            x = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps,
                use_bias=not cfg.ln_no_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="norm_f",
            )(x)

        if cfg.tie_word_embeddings:
            logits = embed.attend(x)
        else:
            logits = nn.Dense(
                cfg.vocab_size,
                use_bias=cfg.lm_head_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="lm_head",
            )(x)
        logits = logits.astype(jnp.float32)

        if cache is not None:
            cache = cache.replace(
                layers=tuple(new_layers),
                index=cache.index + input_ids.shape[1],
            )
        return logits, cache
