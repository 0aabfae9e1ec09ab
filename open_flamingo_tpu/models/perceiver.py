"""PerceiverResampler: compress variable patch tokens into fixed latents.

Capability parity with open_flamingo/src/helpers.py:25-132; re-designed as
pure-functional Flax. Shapes: input (b, T, F, v, D) patch tokens ->
output (b, T, num_latents, D).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LN_EPS, FeedForward, attend, merge_heads, split_heads

Dtype = Any


class PerceiverAttention(nn.Module):
    """Latent cross-attention; K/V come from concat(media tokens, latents).

    Reference: open_flamingo/src/helpers.py:25-65.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, latents: jax.Array) -> jax.Array:
        # x: (b, T, n1, D) media features; latents: (b, T, n2, D)
        inner = self.dim_head * self.heads
        dense = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(epsilon=LN_EPS, dtype=self.dtype, param_dtype=self.param_dtype)

        x = nn.LayerNorm(**ln, name="norm_media")(x)
        latents = nn.LayerNorm(**ln, name="norm_latents")(latents)

        q = nn.Dense(inner, **dense, name="to_q")(latents)
        kv_input = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(inner * 2, **dense, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        q = split_heads(q, self.heads) * (self.dim_head**-0.5)
        k = split_heads(k, self.heads)
        v = split_heads(v, self.heads)

        out = attend(q, k, v)
        out = merge_heads(out)
        return nn.Dense(self.dim, **dense, name="to_out")(out)


class PerceiverResampler(nn.Module):
    """depth x (latent cross-attn + FF), residual, final LayerNorm.

    Reference: open_flamingo/src/helpers.py:68-132. Latents are learned
    (num_latents, dim) params initialized ~N(0,1). Optional frame / media
    time embeddings kept for capability parity (unused by released models).
    """

    dim: int
    depth: int = 6
    dim_head: int = 64
    heads: int = 8
    num_latents: int = 64
    max_num_media: Optional[int] = None
    max_num_frames: Optional[int] = None
    ff_mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (b, T, F, v, D) -> (b, T, num_latents, D)
        b, T, F, v, d = x.shape
        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.dim),
            self.param_dtype,
        ).astype(self.dtype)

        if self.max_num_frames is not None:
            frame_embs = self.param(
                "frame_embs",
                nn.initializers.normal(stddev=1.0),
                (self.max_num_frames, self.dim),
                self.param_dtype,
            ).astype(self.dtype)
            x = x + frame_embs[:F][None, None, :, None, :]

        x = x.reshape(b, T, F * v, d)

        if self.max_num_media is not None:
            media_time_embs = self.param(
                "media_time_embs",
                nn.initializers.normal(stddev=1.0),
                (self.max_num_media, 1, self.dim),
                self.param_dtype,
            ).astype(self.dtype)
            x = x + media_time_embs[:T][None]

        lat = jnp.broadcast_to(latents[None, None], (b, T, self.num_latents, self.dim))
        lat = lat.astype(self.dtype)
        x = x.astype(self.dtype)

        for i in range(self.depth):
            lat = PerceiverAttention(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}_attn",
            )(x, lat) + lat
            lat = FeedForward(
                dim=self.dim,
                mult=self.ff_mult,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}_ff",
            )(lat) + lat

        return nn.LayerNorm(
            epsilon=LN_EPS, dtype=self.dtype, param_dtype=self.param_dtype, name="norm"
        )(lat)
