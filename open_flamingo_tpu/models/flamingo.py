"""Top-level Flamingo model: frozen ViT + frozen LM bridged by a trainable
PerceiverResampler and gated cross-attention (capability parity with
open_flamingo/src/flamingo.py, re-designed pure-functional).

Differences from the reference by design (SURVEY.md §7):
  * vision latents / media locations are explicit values, not layer state
    (`condition_vis_x`, flamingo.py:199-200 has no equivalent);
  * decode state is an explicit KVCache pytree;
  * `cache_media`/`uncache_media` (flamingo.py:315-338) become: call
    `embed_vision` once, keep the latents, pass them to every step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoders.common import DecoderConfig, KVCache
from .lm import FlamingoLM
from .perceiver import PerceiverResampler
from .vit import VisionConfig, VisionTransformer
from .xattn import media_time_from_locations

Dtype = Any


@dataclasses.dataclass(frozen=True)
class FlamingoConfig:
    vision: VisionConfig
    lm: DecoderConfig
    media_token_id: int
    eoc_token_id: int  # <|endofchunk|>
    cross_attn_every_n: int = 1
    num_vis_latents: int = 64
    perceiver_depth: int = 6
    perceiver_heads: int = 8
    perceiver_dim_head: int = 64
    only_attend_immediate_media: bool = True
    freeze_vision: bool = True
    gradient_checkpointing: bool = False
    # lax.scan over stacked layer groups (compile time O(1) in depth);
    # convert per-layer params with models.lm.to_scanned_layout
    scan_layers: bool = False


class Flamingo(nn.Module):
    cfg: FlamingoConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.vision_encoder = VisionTransformer(
            cfg=c.vision, dtype=self.dtype, param_dtype=self.param_dtype
        )
        self.perceiver = PerceiverResampler(
            dim=c.vision.hidden_size,
            depth=c.perceiver_depth,
            dim_head=c.perceiver_dim_head,
            heads=c.perceiver_heads,
            num_latents=c.num_vis_latents,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.lm = FlamingoLM(
            cfg=c.lm,
            vis_dim=c.vision.hidden_size,
            cross_attn_every_n=c.cross_attn_every_n,
            only_attend_immediate_media=c.only_attend_immediate_media,
            remat=c.gradient_checkpointing,
            scan_layers=c.scan_layers,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def embed_vision(self, vision_x: jax.Array) -> jax.Array:
        """(B, T_img, F, H, W, C) NHWC pixels -> (B, T_img, n_latents, D).

        Mirrors _encode_vision_x (open_flamingo/src/flamingo.py:177-200):
        frozen ViT over every frame, then the perceiver.
        """
        b, t, f, h, w, c = vision_x.shape
        x = vision_x.reshape(b * t * f, h, w, c)
        x = self.vision_encoder(x)
        if self.cfg.freeze_vision:
            x = jax.lax.stop_gradient(x)
        v, d = x.shape[-2:]
        x = x.reshape(b, t, f, v, d)
        return self.perceiver(x)

    def __call__(
        self,
        vision_x: Optional[jax.Array],
        lang_x: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        *,
        media_latents: Optional[jax.Array] = None,
        cache: Optional[KVCache] = None,
    ) -> Tuple[jax.Array, jax.Array, Optional[KVCache]]:
        """Full forward (training / prefill).

        Returns (logits, media_latents, cache). Pass `media_latents` to skip
        vision encoding (the cache_media path).
        """
        if media_latents is None:
            media_latents = self.embed_vision(vision_x)
        media_locations = lang_x == self.cfg.media_token_id
        text_time = media_time_from_locations(media_locations)
        logits, cache = self.lm(
            lang_x,
            attention_mask,
            media=media_latents,
            text_time=text_time,
            cache=cache,
        )
        return logits, media_latents, cache

    def resample_vision(self, x: jax.Array) -> jax.Array:
        """(b, t, f, v, d) ViT patch tokens -> perceiver latents — the
        back half of embed_vision, for callers that computed the ViT
        forward elsewhere (the absorbed-ViT path, models/absorb_vit.py)."""
        if self.cfg.freeze_vision:
            x = jax.lax.stop_gradient(x)
        return self.perceiver(x)

    def decode_step_absorb(
        self,
        media_latents: jax.Array,
        lang_x: jax.Array,
        attention_mask: jax.Array,
        cache: KVCache,
        num_media: jax.Array,
        side_xw: jax.Array,
        side_vp,
        side_plan,
        side_interpret=None,
    ) -> Tuple[jax.Array, KVCache, jax.Array]:
        """decode_step carrying one step's absorbed-ViT side schedule:
        the NEXT batch's ViT layers ride this step's weight streams
        (models/absorb_vit.py). Returns (logits, cache, new workspace)."""
        text_time = jnp.broadcast_to(
            num_media[:, None], (lang_x.shape[0], lang_x.shape[1])
        ).astype(jnp.int32)
        logits, cache, xw = self.lm(
            lang_x,
            attention_mask,
            media=media_latents,
            text_time=text_time,
            cache=cache,
            side=(side_vp, side_xw, side_plan, side_interpret),
        )
        return logits, cache, xw

    def decode_step(
        self,
        media_latents: jax.Array,
        lang_x: jax.Array,
        attention_mask: jax.Array,
        cache: KVCache,
        num_media: jax.Array,
    ) -> Tuple[jax.Array, KVCache]:
        """Incremental decode: all current tokens attend to the last cached
        media (flamingo_lm.py:142-151 cached-media rule).

        num_media: (B,) count of media tokens in the prefix.
        """
        text_time = jnp.broadcast_to(
            num_media[:, None], (lang_x.shape[0], lang_x.shape[1])
        ).astype(jnp.int32)
        logits, cache = self.lm(
            lang_x,
            attention_mask,
            media=media_latents,
            text_time=text_time,
            cache=cache,
        )
        return logits, cache


def count_media(lang_x: jax.Array, media_token_id: int) -> jax.Array:
    return jnp.sum((lang_x == media_token_id).astype(jnp.int32), axis=-1)
