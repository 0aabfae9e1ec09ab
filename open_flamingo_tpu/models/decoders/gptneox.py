"""GPT-NeoX decoder block (rotary, parallel residual) — Pythia /
RedPajama-INCITE (OF-4B) LM family.

Semantics match HF GPTNeoXForCausalLM: fused query_key_value with
per-head-interleaved [q_h|k_h|v_h] layout, partial rotary (rotary_pct),
parallel residual x + attn(ln1(x)) + mlp(ln2(x)), biased projections.
Reference capability: open_flamingo/src/factory.py:132-141 (gpt_neox).
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
    apply_rope,
    rope_cos_sin,
)

Dtype = Any


class GPTNeoXBlock(nn.Module):
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
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype
        )

        h = nn.LayerNorm(**ln, name="input_layernorm")(x)
        qkv = nn.Dense(3 * cfg.hidden_size, **dense, name="query_key_value")(h)
        # HF layout: (B, T, H, 3*Dh) then chunk -> per-head interleave
        qkv = qkv.reshape(b, t, cfg.num_heads, 3 * cfg.head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        rotary_ndims = int(cfg.head_dim * cfg.rotary_pct)
        cos, sin = rope_cos_sin(attn.position_ids, rotary_ndims, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)

        from ...ops.attention import cached_self_attention

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        attn_out = nn.Dense(cfg.hidden_size, **dense, name="dense")(merge_heads(out))

        # parallel: x + attn(ln1(x)) + mlp(ln2(x))
        # sequential: x' = x + attn_out; x' + mlp(ln2(x'))
        mlp_in = x if cfg.use_parallel_residual else x + attn_out
        h2 = nn.LayerNorm(**ln, name="post_attention_layernorm")(mlp_in)
        h2 = nn.Dense(cfg.intermediate_size, **dense, name="dense_h_to_4h")(h2)
        h2 = gelu_exact(h2)
        mlp_out = nn.Dense(cfg.hidden_size, **dense, name="dense_4h_to_h")(h2)

        return x + attn_out + mlp_out, new_kv
