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

from ..layers import PDense, PLayerNorm, merge_heads
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

        d = cfg.hidden_size
        ln_1 = PLayerNorm(d, **ln, name="self_attn_layer_norm")
        q_proj = PDense(d, d, **dense, name="q_proj")
        k_proj = PDense(d, d, **dense, name="k_proj")
        v_proj = PDense(d, d, **dense, name="v_proj")
        out_proj = PDense(d, d, **dense, name="out_proj")
        ln_2 = PLayerNorm(d, **ln, name="final_layer_norm")
        fc1 = PDense(d, cfg.intermediate_size, **dense, name="fc1")
        fc2 = PDense(cfg.intermediate_size, d, **dense, name="fc2")

        from ...ops.attention import cached_self_attention
        from ...ops.dense_stream import use_fused_decode

        from ...ops.dense_stream import fused_head_dim_ok

        if (use_fused_decode(t, attn.cached) and layer_kv is not None
                # int8 KV caches route through the scan engine or the
                # einsum fallback (update_layer_kv dequant), not the
                # unrolled fused kernels
                and not layer_kv.int8
                and fused_head_dim_ok(cfg.head_dim)):
            from ...ops.decode_layer import attend_out_decode
            from ...ops.dense_stream import fused_dense, fused_mlp

            x2 = x[:, 0]
            ln_kw = dict(
                ln_scale=ln_1.scale, ln_bias=ln_1.bias,
                eps=cfg.layer_norm_eps,
            )
            w_q, s_q = q_proj.stream_weight()
            w_k, s_k = k_proj.stream_weight()
            w_v, s_v = v_proj.stream_weight()
            w_o, s_o = out_proj.stream_weight()
            w_1, s_1 = fc1.stream_weight()
            w_2, s_2 = fc2.stream_weight()
            q = fused_dense(x2, w_q, w_scale=s_q,
                            bias=q_proj.bias, **ln_kw)
            k = fused_dense(x2, w_k, w_scale=s_k,
                            bias=k_proj.bias, **ln_kw)
            v = fused_dense(x2, w_v, w_scale=s_v,
                            bias=v_proj.bias, **ln_kw)
            hd = cfg.head_dim
            x2, kc, vc = attend_out_decode(
                q.reshape(b, cfg.num_heads, hd),
                layer_kv.k, layer_kv.v, attn.pad_mask,
                w_o.reshape(cfg.num_heads, hd, d),
                scale=hd**-0.5,
                k_new=k.reshape(b, cfg.num_heads, hd),
                v_new=v.reshape(b, cfg.num_heads, hd),
                slot=attn.kv_slot,
                wout_scale=s_o,
                bias=out_proj.bias, residual=x2,
            )
            y = fused_mlp(
                x2,
                w_1,
                w_2,
                w1_scale=s_1, w2_scale=s_2,
                b1=fc1.bias, b2=fc2.bias,
                ln_scale=ln_2.scale, ln_bias=ln_2.bias,
                eps=cfg.layer_norm_eps,
                act="relu",
                residual=x2,
            )
            return y[:, None], LayerKV(k=kc, v=vc)

        h = ln_1(x)
        q = q_proj(h)
        k = k_proj(h)
        v = v_proj(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        x = x + out_proj(merge_heads(out))

        h = ln_2(x)
        h = fc1(h)
        h = jax.nn.relu(h)
        h = fc2(h)
        return x + h, new_kv
