"""CLIP Vision Transformer — the frozen vision tower.

Replaces the reference's open_clip dependency (open_flamingo/src/
factory.py:42-48, visual.output_tokens=True): Flamingo consumes the patch
tokens (post-ln_post, class token dropped — open_clip output_tokens
semantics; open_flamingo/src/flamingo.py:194-195 takes output [1]).

TPU-first choices: NHWC images, patch embedding as a single reshape +
matmul (maps straight onto the MXU instead of a conv), fp32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    PDense,
    PLayerNorm,
    attend,
    gelu_exact,
    merge_heads,
    split_heads,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # OpenAI CLIP
    # True: ln_post applied to all tokens before dropping CLS (open_clip
    # output_tokens semantics — what Flamingo consumes). False: raw encoder
    # output (HF CLIPVisionModel last_hidden_state).
    post_ln_tokens: bool = True
    # CLIP visual projection width (open_clip `visual.proj` / HF
    # visual_projection). Needed for encode_image-style pooled features
    # (RICES retrieval, open_flamingo/eval/rices.py:58); None for towers
    # only consumed as patch tokens.
    projection_dim: Any = None

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return gelu_exact
    raise ValueError(name)


class ViTBlock(nn.Module):
    cfg: VisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        dense = dict(use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
        )
        from ..ops.layer_norm import layer_norm_vjp, use_ln_kernel

        ln1 = PLayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="layer_norm1")
        ln2 = PLayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="layer_norm2")
        if use_ln_kernel():
            # one-pass Pallas LN: XLA's convert_reduce+VMEM-copy fusions
            # stall ~10x over bandwidth here (ops/layer_norm.py)
            h = layer_norm_vjp(x, ln1.scale, ln1.bias, cfg.layer_norm_eps)
        else:
            h = ln1(x)
        # PDense (same param tree as nn.Dense): W8A8 int8 forward when a
        # qparams side-car is bound (quantize_prefill_params)
        q = PDense(cfg.hidden_size, cfg.hidden_size, **dense, name="q_proj")(h)
        k = PDense(cfg.hidden_size, cfg.hidden_size, **dense, name="k_proj")(h)
        v = PDense(cfg.hidden_size, cfg.hidden_size, **dense, name="v_proj")(h)
        from ..ops.vit_attention import use_vit_kernel, vit_attention

        nh, dh = cfg.num_heads, cfg.head_dim
        if use_vit_kernel():
            # batched whole-sequence Pallas attention: the fp32 score
            # tensor stays in VMEM (ops/vit_attention.py)
            b2, t2, _ = q.shape
            qf = q.reshape(b2, t2, nh, dh).transpose(0, 2, 1, 3)
            kf = k.reshape(b2, t2, nh, dh).transpose(0, 2, 1, 3)
            vf = v.reshape(b2, t2, nh, dh).transpose(0, 2, 1, 3)
            out = vit_attention(
                qf.reshape(b2 * nh, t2, dh),
                kf.reshape(b2 * nh, t2, dh),
                vf.reshape(b2 * nh, t2, dh),
                dh**-0.5,
            )
            out = (
                out.reshape(b2, nh, t2, dh)
                .transpose(0, 2, 1, 3)
                .reshape(b2, t2, nh * dh)
            )
            x = x + PDense(
                cfg.hidden_size, cfg.hidden_size, **dense, name="out_proj"
            )(out)
        else:
            q = split_heads(q, nh) * (dh**-0.5)
            out = attend(q, split_heads(k, nh), split_heads(v, nh))
            x = x + PDense(
                cfg.hidden_size, cfg.hidden_size, **dense, name="out_proj"
            )(merge_heads(out))

        if use_ln_kernel():
            h = layer_norm_vjp(x, ln2.scale, ln2.bias, cfg.layer_norm_eps)
        else:
            h = ln2(x)
        h = PDense(cfg.hidden_size, cfg.intermediate_size, **dense,
                   name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = PDense(cfg.intermediate_size, cfg.hidden_size, **dense,
                   name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    """pixel_values (B, H, W, C) NHWC -> patch tokens (B, num_patches, D).

    output="projected" returns open_clip encode_image semantics instead:
    ln_post(CLS) @ proj, unit-normalized by the caller — the embedding
    RICES retrieval uses (reference eval/rices.py:58). Requires
    cfg.projection_dim; the "proj" param is only created when this path
    is traced (init with output="projected" to get it)."""

    cfg: VisionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pixel_values: jax.Array, *, output: str = "tokens"
    ) -> jax.Array:
        cfg = self.cfg
        b, hh, ww, c = pixel_values.shape
        p, g = cfg.patch_size, cfg.grid
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
        )

        # patchify: (B, g, p, g, p, C) -> (B, g*g, p*p*C); feature order
        # (ph, pw, c) — the converter reshapes conv kernels to match.
        x = pixel_values.astype(self.dtype)
        x = x.reshape(b, g, p, g, p, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, g * g, p * p * c)
        x = nn.Dense(
            cfg.hidden_size,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="patch_embed",
        )(x)

        cls = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.hidden_size,),
            self.param_dtype,
        ).astype(self.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), x], axis=1)

        pos = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_patches + 1, cfg.hidden_size),
            self.param_dtype,
        ).astype(self.dtype)
        x = x + pos[None]

        x = nn.LayerNorm(**ln, name="pre_layernorm")(x)
        for i in range(cfg.num_layers):
            x = ViTBlock(
                cfg=cfg,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"blocks_{i}",
            )(x)

        if output == "projected":
            assert cfg.projection_dim, "projection_dim required for encode_image"
            pooled = nn.LayerNorm(**ln, name="post_layernorm")(x[:, 0])
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=cfg.hidden_size**-0.5),
                (cfg.hidden_size, cfg.projection_dim),
                self.param_dtype,
            )
            return pooled @ proj.astype(self.dtype)

        if cfg.post_ln_tokens:
            x = nn.LayerNorm(**ln, name="post_layernorm")(x)
        return x[:, 1:]  # drop CLS: Flamingo consumes patch tokens only
