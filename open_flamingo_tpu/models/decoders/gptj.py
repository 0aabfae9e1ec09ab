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

from ..layers import PDense, PLayerNorm, gelu_exact, merge_heads
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

        d = cfg.hidden_size
        ln_1 = PLayerNorm(
            d, epsilon=cfg.layer_norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name="ln_1",
        )
        q_proj = PDense(d, d, **nobias, name="q_proj")
        k_proj = PDense(d, d, **nobias, name="k_proj")
        v_proj = PDense(d, d, **nobias, name="v_proj")
        out_proj = PDense(d, d, **nobias, name="out_proj")
        fc_in = PDense(d, cfg.intermediate_size, **bias, name="fc_in")
        fc_out = PDense(cfg.intermediate_size, d, **bias, name="fc_out")

        rotary_dim = cfg.rotary_dim or cfg.head_dim
        # HF GPT-J defaults to activation_function="gelu_new" (tanh form)
        act_name = "gelu_new" if cfg.hidden_act == "gelu_new" else "gelu"
        act_fn = (
            (lambda v: jax.nn.gelu(v, approximate=True))
            if act_name == "gelu_new" else gelu_exact
        )
        from ...ops.attention import cached_self_attention
        from ...ops.dense_stream import use_fused_decode

        from ...ops.dense_stream import fused_head_dim_ok

        if (use_fused_decode(t, attn.cached) and layer_kv is not None
                # int8 KV caches route through the scan engine or the
                # einsum fallback (update_layer_kv dequant), not the
                # unrolled fused kernels
                and not layer_kv.int8
                and fused_head_dim_ok(cfg.head_dim)):
            # decode: shared-LN q/k/v, write+attend+out-proj, and the
            # biased MLP (parallel residual) as weight-streaming kernels
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
            w_in, s_in = fc_in.stream_weight()
            w_fo, s_fo = fc_out.stream_weight()
            q = fused_dense(x2, w_q, w_scale=s_q, **ln_kw)
            k = fused_dense(x2, w_k, w_scale=s_k, **ln_kw)
            v = fused_dense(x2, w_v, w_scale=s_v, **ln_kw)
            q = q.reshape(b, cfg.num_heads, cfg.head_dim)
            k = k.reshape(b, cfg.num_heads, cfg.head_dim)
            v = v.reshape(b, cfg.num_heads, cfg.head_dim)
            q, k = apply_rope_interleaved(
                q[:, None], k[:, None], attn.position_ids, rotary_dim,
                cfg.rope_theta,
            )
            hd = cfg.head_dim
            attn_out, kc, vc = attend_out_decode(
                q[:, 0], layer_kv.k, layer_kv.v, attn.pad_mask,
                w_o.reshape(cfg.num_heads, hd, d),
                scale=hd**-0.5,
                k_new=k[:, 0], v_new=v, slot=attn.kv_slot,
                wout_scale=s_o,
            )
            y = fused_mlp(
                x2,
                w_in,
                w_fo,
                w1_scale=s_in, w2_scale=s_fo,
                b1=fc_in.bias, b2=fc_out.bias,
                act=act_name,
                residual=x2 + attn_out,
                **ln_kw,
            )
            return y[:, None], LayerKV(k=kc, v=vc)

        h = ln_1(x)
        q = q_proj(h)
        k = k_proj(h)
        v = v_proj(h)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        q, k = apply_rope_interleaved(
            q, k, attn.position_ids, rotary_dim, cfg.rope_theta
        )

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv, scale=cfg.head_dim**-0.5
        )
        attn_out = out_proj(merge_heads(out))

        h2 = fc_in(h)
        h2 = act_fn(h2)
        mlp_out = fc_out(h2)

        return x + attn_out + mlp_out, new_kv
