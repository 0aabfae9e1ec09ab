"""LLaMA decoder block (RMSNorm, full rotary, SwiGLU, GQA).

Semantics match HF LlamaForCausalLM. Reference capability:
open_flamingo/src/factory.py:132-141 (llama family).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import PDense, merge_heads
from .common import (
    AttnInputs,
    DecoderConfig,
    LayerKV,
    apply_rope,
    rope_cos_sin,
)

Dtype = Any


class RMSNorm(nn.Module):
    """HF LlamaRMSNorm: fp32 variance, scale applied after cast back.
    setup-declared scale so fused decode kernels can read it raw."""

    features: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(var + self.eps)
        return (self.scale * xf.astype(self.dtype)).astype(self.dtype)


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
        d = cfg.hidden_size
        n_rep = cfg.num_heads // h_kv

        ln_1 = RMSNorm(d, **norm, name="input_layernorm")
        q_proj = PDense(d, cfg.num_heads * cfg.head_dim, **dense, name="q_proj")
        k_proj = PDense(d, h_kv * cfg.head_dim, **dense, name="k_proj")
        v_proj = PDense(d, h_kv * cfg.head_dim, **dense, name="v_proj")
        o_proj = PDense(cfg.num_heads * cfg.head_dim, d, **dense, name="o_proj")
        ln_2 = RMSNorm(d, **norm, name="post_attention_layernorm")
        gate_proj = PDense(d, cfg.intermediate_size, **dense, name="gate_proj")
        up_proj = PDense(d, cfg.intermediate_size, **dense, name="up_proj")
        down_proj = PDense(cfg.intermediate_size, d, **dense, name="down_proj")

        from ...ops.attention import cached_self_attention
        from ...ops.dense_stream import use_fused_decode

        from ...ops.dense_stream import fused_head_dim_ok

        if (use_fused_decode(t, attn.cached) and layer_kv is not None
                # int8 KV caches route through the scan engine or the
                # einsum fallback (update_layer_kv dequant), not the
                # unrolled fused kernels
                and not layer_kv.int8
                and fused_head_dim_ok(cfg.head_dim)):
            # decode: RMS+q/k/v, write+attend+out+residual, and a
            # SwiGLU MLP (gate & up stream through one pipeline) as
            # weight-streaming kernels. GQA streams the grouped KV cache
            # via head index maps (attend_out_decode n_rep support).
            from ...ops.decode_layer import attend_out_decode
            from ...ops.dense_stream import fused_dense, fused_mlp

            x2 = x[:, 0]
            ln_kw = dict(
                ln_scale=ln_1.scale, eps=cfg.layer_norm_eps, norm="rms"
            )
            w_q, s_q = q_proj.stream_weight()
            w_k, s_k = k_proj.stream_weight()
            w_v, s_v = v_proj.stream_weight()
            w_o, s_o = o_proj.stream_weight()
            q = fused_dense(x2, w_q, w_scale=s_q, **ln_kw)
            k = fused_dense(x2, w_k, w_scale=s_k, **ln_kw)
            v = fused_dense(x2, w_v, w_scale=s_v, **ln_kw)
            q = q.reshape(b, cfg.num_heads, cfg.head_dim)
            k = k.reshape(b, h_kv, cfg.head_dim)
            v = v.reshape(b, h_kv, cfg.head_dim)
            cos, sin = rope_cos_sin(
                attn.position_ids, cfg.head_dim, cfg.rope_theta
            )
            q, k = apply_rope(q[:, None], k[:, None], cos, sin)
            hd = cfg.head_dim
            w_gate, s_gate = gate_proj.stream_weight()
            w_up, s_up = up_proj.stream_weight()
            w_down, s_down = down_proj.stream_weight()
            x2, kc, vc = attend_out_decode(
                q[:, 0], layer_kv.k, layer_kv.v, attn.pad_mask,
                w_o.reshape(cfg.num_heads, hd, d),
                scale=hd**-0.5,
                k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
                wout_scale=s_o,
                residual=x2,
            )
            y = fused_mlp(
                x2,
                w_gate,
                w_down,
                w1_gate=w_up,
                w1_scale=s_gate, w2_scale=s_down, w1_gate_scale=s_up,
                ln_scale=ln_2.scale, eps=cfg.layer_norm_eps, norm="rms",
                act="silu",
                residual=x2,
            )
            return y[:, None], LayerKV(k=kc, v=vc)

        h = ln_1(x)
        q = q_proj(h)
        k = k_proj(h)
        v = v_proj(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, h_kv, cfg.head_dim)
        v = v.reshape(b, t, h_kv, cfg.head_dim)

        cos, sin = rope_cos_sin(attn.position_ids, cfg.head_dim, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5, n_rep=n_rep
        )
        x = x + o_proj(merge_heads(out))

        h = ln_2(x)
        down = down_proj(jax.nn.silu(gate_proj(h)) * up_proj(h))
        return x + down, new_kv
