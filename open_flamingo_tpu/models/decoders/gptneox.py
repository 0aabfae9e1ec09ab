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

from ..layers import PDense, PLayerNorm, gelu_exact, merge_heads
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

        d = cfg.hidden_size
        ln_1 = PLayerNorm(d, **ln, name="input_layernorm")
        wqkv = PDense(d, 3 * d, **dense, name="query_key_value")
        out_proj = PDense(d, d, **dense, name="dense")
        ln_2 = PLayerNorm(d, **ln, name="post_attention_layernorm")
        up = PDense(d, cfg.intermediate_size, **dense, name="dense_h_to_4h")
        down = PDense(cfg.intermediate_size, d, **dense, name="dense_4h_to_h")

        from ...ops.attention import cached_self_attention
        from ...ops.dense_stream import use_fused_decode

        rotary_ndims = int(cfg.head_dim * cfg.rotary_pct)

        from ...ops.dense_stream import fused_head_dim_ok

        if (use_fused_decode(t, attn.cached) and layer_kv is not None
                # int8 KV caches route through the scan engine or the
                # einsum fallback (update_layer_kv dequant), not the
                # unrolled fused kernels
                and not layer_kv.int8
                and fused_head_dim_ok(cfg.head_dim)):
            # decode: LN+QKV / write+attend+out-proj(+bias) / LN+MLP as
            # weight-streaming kernels; RoPE stays an XLA op (tiny)
            from ...ops.decode_layer import attend_out_decode
            from ...ops.dense_stream import fused_dense, fused_mlp

            x2 = x[:, 0]
            w_qkv, s_qkv = wqkv.stream_weight()
            w_out, s_out = out_proj.stream_weight()
            w_up, s_up = up.stream_weight()
            w_down, s_down = down.stream_weight()
            qkv = fused_dense(
                x2, w_qkv, w_scale=s_qkv,
                bias=wqkv.bias if cfg.attention_bias else None,
                ln_scale=ln_1.scale, ln_bias=ln_1.bias,
                eps=cfg.layer_norm_eps,
            )
            qkv = qkv.reshape(b, cfg.num_heads, 3 * cfg.head_dim)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            cos, sin = rope_cos_sin(
                attn.position_ids, rotary_ndims, cfg.rope_theta
            )
            q, k = apply_rope(q[:, None], k[:, None], cos, sin)
            hd = cfg.head_dim
            attn_out, kc, vc = attend_out_decode(
                q[:, 0], layer_kv.k, layer_kv.v, attn.pad_mask,
                w_out.reshape(cfg.num_heads, hd, d),
                scale=hd**-0.5,
                k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
                wout_scale=s_out,
                bias=out_proj.bias if cfg.attention_bias else None,
            )
            mlp_in = x2 if cfg.use_parallel_residual else x2 + attn_out
            y = fused_mlp(
                mlp_in,
                w_up,
                w_down,
                w1_scale=s_up, w2_scale=s_down,
                b1=up.bias if cfg.attention_bias else None,
                b2=down.bias if cfg.attention_bias else None,
                ln_scale=ln_2.scale, ln_bias=ln_2.bias,
                eps=cfg.layer_norm_eps,
                act="gelu",
                residual=x2 + attn_out,
            )
            return y[:, None], LayerKV(k=kc, v=vc)

        h = ln_1(x)
        qkv = wqkv(h)
        # HF layout: (B, T, H, 3*Dh) then chunk -> per-head interleave
        qkv = qkv.reshape(b, t, cfg.num_heads, 3 * cfg.head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        cos, sin = rope_cos_sin(attn.position_ids, rotary_ndims, cfg.rope_theta)
        q, k = apply_rope(q, k, cos, sin)

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        attn_out = out_proj(merge_heads(out))

        # parallel: x + attn(ln1(x)) + mlp(ln2(x))
        # sequential: x' = x + attn_out; x' + mlp(ln2(x'))
        mlp_in = x if cfg.use_parallel_residual else x + attn_out
        h2 = ln_2(mlp_in)
        h2 = up(h2)
        h2 = gelu_exact(h2)
        mlp_out = down(h2)

        return x + attn_out + mlp_out, new_kv
