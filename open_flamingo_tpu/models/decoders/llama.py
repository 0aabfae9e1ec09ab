"""LLaMA decoder block (RMSNorm, full rotary, SwiGLU, GQA).

Semantics match HF LlamaForCausalLM. Reference capability:
open_flamingo/src/factory.py:132-141 (llama family).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import merge_heads
from .common import (
    AttnInputs,
    DecoderConfig,
    LayerKV,
    apply_rope,
    rope_cos_sin,
)

Dtype = Any


class RMSNorm(nn.Module):
    """HF LlamaRMSNorm: fp32 variance, scale applied after cast back."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.param_dtype)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (w * xf.astype(self.dtype)).astype(self.dtype)


from .common import repeat_kv  # noqa: E402  (re-export, lives in common)


class LlamaBlock(nn.Module):
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
        dense = dict(
            use_bias=cfg.attention_bias, dtype=self.dtype, param_dtype=self.param_dtype
        )
        norm = dict(
            eps=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
        )
        h_kv = cfg.kv_heads

        h = RMSNorm(**norm, name="input_layernorm")(x)
        q = nn.Dense(cfg.num_heads * cfg.head_dim, **dense, name="q_proj")(h)
        k = nn.Dense(h_kv * cfg.head_dim, **dense, name="k_proj")(h)
        v = nn.Dense(h_kv * cfg.head_dim, **dense, name="v_proj")(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, h_kv, cfg.head_dim)
        v = v.reshape(b, t, h_kv, cfg.head_dim)

        cos, sin = rope_cos_sin(attn.position_ids, cfg.head_dim, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)

        n_rep = cfg.num_heads // h_kv
        from ...ops.attention import cached_self_attention

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5, n_rep=n_rep
        )
        x = x + nn.Dense(cfg.hidden_size, **dense, name="o_proj")(merge_heads(out))

        h = RMSNorm(**norm, name="post_attention_layernorm")(x)
        gate = nn.Dense(cfg.intermediate_size, **dense, name="gate_proj")(h)
        up = nn.Dense(cfg.intermediate_size, **dense, name="up_proj")(h)
        down = nn.Dense(
            cfg.hidden_size, **dense, name="down_proj"
        )(jax.nn.silu(gate) * up)
        return x + down, new_kv
