"""GPT-J decoder block (interleaved rotary, single-LN parallel residual).

Semantics match HF GPTJForCausalLM: ln_1 feeds BOTH attention and MLP;
x = x + attn(ln_1(x)) + mlp(ln_1(x)); q/k/v/out without bias, MLP with
bias, rotate_every_two rotary on the first rotary_dim channels.
Reference capability: open_flamingo/src/factory.py:132-141 (gptj).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import gelu_exact, merge_heads
from .common import (
    AttnInputs,
    DecoderConfig,
    LayerKV,
    apply_rope_interleaved,
)

Dtype = Any


class GPTJBlock(nn.Module):
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
        nobias = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        bias = dict(use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype)

        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="ln_1",
        )(x)
        q = nn.Dense(cfg.hidden_size, **nobias, name="q_proj")(h)
        k = nn.Dense(cfg.hidden_size, **nobias, name="k_proj")(h)
        v = nn.Dense(cfg.hidden_size, **nobias, name="v_proj")(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        rotary_dim = cfg.rotary_dim or cfg.head_dim
        q, k = apply_rope_interleaved(
            q, k, attn.position_ids, rotary_dim, cfg.rope_theta
        )

        from ...ops.attention import cached_self_attention

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        attn_out = nn.Dense(cfg.hidden_size, **nobias, name="out_proj")(
            merge_heads(out)
        )

        h2 = nn.Dense(cfg.intermediate_size, **bias, name="fc_in")(h)
        h2 = gelu_exact(h2)
        mlp_out = nn.Dense(cfg.hidden_size, **bias, name="fc_out")(h2)

        return x + attn_out + mlp_out, new_kv
