"""OPT decoder block (pre-LN, learned positions handled in FlamingoLM,
ReLU MLP, all projections biased).

Semantics match HF OPTForCausalLM (do_layer_norm_before=True models).
Reference capability: open_flamingo/src/factory.py:132-141 (opt).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import merge_heads
from .common import AttnInputs, DecoderConfig, LayerKV

Dtype = Any


class OPTBlock(nn.Module):
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
        dense = dict(use_bias=True, dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

        h = nn.LayerNorm(**ln, name="self_attn_layer_norm")(x)
        q = nn.Dense(cfg.hidden_size, **dense, name="q_proj")(h)
        k = nn.Dense(cfg.hidden_size, **dense, name="k_proj")(h)
        v = nn.Dense(cfg.hidden_size, **dense, name="v_proj")(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        from ...ops.attention import cached_self_attention

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        x = x + nn.Dense(cfg.hidden_size, **dense, name="out_proj")(
            merge_heads(out)
        )

        h = nn.LayerNorm(**ln, name="final_layer_norm")(x)
        h = nn.Dense(cfg.intermediate_size, **dense, name="fc1")(h)
        h = jax.nn.relu(h)
        h = nn.Dense(cfg.hidden_size, **dense, name="fc2")(h)
        return x + h, new_kv
