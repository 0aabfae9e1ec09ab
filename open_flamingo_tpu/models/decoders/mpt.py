"""MPT decoder block (ALiBi, no biases) — the OF-3B / OF-9B LM family.

Semantics match HF MptForCausalLM / mosaicml mosaic_gpt: fused Wqkv with
[q|k|v] column layout, optional clip_qkv clamp, softmax scale
1/sqrt(head_dim), key-position-only ALiBi bias (translation-invariant
form), LayerNorms without bias, 4x GELU MLP without biases.
Reference capability: open_flamingo/src/factory.py:132-141 (mpt family).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import gelu_exact, merge_heads
from .common import AttnInputs, DecoderConfig, LayerKV, alibi_bias

Dtype = Any


class MPTBlock(nn.Module):
    cfg: DecoderConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attn: AttnInputs,
        layer_kv: Optional[LayerKV],
    ) -> Tuple[jax.Array, Optional[LayerKV]]:
        cfg = self.cfg
        b, t, _ = x.shape
        dense = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps,
            use_bias=not cfg.ln_no_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        h = nn.LayerNorm(**ln, name="norm_1")(x)
        qkv = nn.Dense(3 * cfg.hidden_size, **dense, name="Wqkv")(h)
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        from ...ops.attention import cached_self_attention
        from .common import alibi_slopes

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv,
            scale=cfg.head_dim**-0.5,
            alibi_slopes=alibi_slopes(cfg.num_heads, cfg.alibi_bias_max),
            bias=alibi_bias(cfg.num_heads, attn.kv_len, cfg.alibi_bias_max),
        )
        out = nn.Dense(cfg.hidden_size, **dense, name="out_proj")(merge_heads(out))
        x = x + out

        h = nn.LayerNorm(**ln, name="norm_2")(x)
        h = nn.Dense(cfg.intermediate_size, **dense, name="up_proj")(h)
        h = gelu_exact(h)
        h = nn.Dense(cfg.hidden_size, **dense, name="down_proj")(h)
        return x + h, new_kv
