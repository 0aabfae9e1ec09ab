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

from ..layers import PDense, PLayerNorm, gelu_exact, merge_heads
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
        d = cfg.hidden_size
        dense = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        ln = dict(
            epsilon=cfg.layer_norm_eps,
            use_bias=not cfg.ln_no_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        norm_1 = PLayerNorm(d, **ln, name="norm_1")
        wqkv = PDense(d, 3 * d, **dense, name="Wqkv")
        out_proj = PDense(d, d, **dense, name="out_proj")
        norm_2 = PLayerNorm(d, **ln, name="norm_2")
        up_proj = PDense(d, cfg.intermediate_size, **dense, name="up_proj")
        down_proj = PDense(cfg.intermediate_size, d, **dense, name="down_proj")

        from ...ops.attention import cached_self_attention
        from ...ops.dense_stream import use_fused_decode
        from .common import alibi_slopes

        slopes = alibi_slopes(cfg.num_heads, cfg.alibi_bias_max)

        from ...ops.dense_stream import fused_head_dim_ok

        if (use_fused_decode(t, attn.cached) and layer_kv is not None
                # int8 KV caches route through the scan engine or the
                # einsum fallback (update_layer_kv dequant), not the
                # unrolled fused kernels
                and not layer_kv.int8
                and fused_head_dim_ok(cfg.head_dim)):
            from ...ops import fused_layer
            from ...ops.decode_layer import attn_block_decode
            from ...ops.dense_stream import fused_mlp

            hd = cfg.head_dim
            w_qkv, s_qkv = wqkv.stream_weight()
            w_out, s_out = out_proj.stream_weight()
            w_up, s_up = up_proj.stream_weight()
            w_down, s_down = down_proj.stream_weight()
            ln1b = norm_1.bias if not cfg.ln_no_bias else None
            ln2b = norm_2.bias if not cfg.ln_no_bias else None
            if not fused_layer.DISABLE:
                # decode: ONE launch for the whole layer (attention
                # phase on a head-group grid, then MLP K2 blocks)
                y, kc, vc = fused_layer.fused_layer_decode(
                    x[:, 0], norm_1.scale, ln1b,
                    w_qkv, w_out, layer_kv.k, layer_kv.v, attn.pad_mask,
                    w_up, w_down, norm_2.scale, ln2b,
                    heads=cfg.num_heads, head_dim=hd, scale=hd**-0.5,
                    act="gelu", fused_qkv=True, slot=attn.kv_slot,
                    slopes=slopes, clip=cfg.clip_qkv,
                    wq_scale=s_qkv, wout_scale=s_out,
                    w1_scale=s_up, w2_scale=s_down,
                    eps=cfg.layer_norm_eps,
                )
                return y[:, None], LayerKV(k=kc, v=vc)

            # two-launch path (A/B hook): attention half, then MLP
            x2, kc, vc = attn_block_decode(
                x[:, 0],
                norm_1.scale,
                ln1b,
                w_qkv,
                w_out,
                layer_kv.k, layer_kv.v, attn.pad_mask,
                heads=cfg.num_heads, head_dim=hd, scale=hd**-0.5,
                fused_qkv=True, slot=attn.kv_slot, slopes=slopes,
                clip=cfg.clip_qkv, eps=cfg.layer_norm_eps,
                wq_scale=s_qkv, wout_scale=s_out,
            )
            y = fused_mlp(
                x2,
                w_up,
                w_down,
                w1_scale=s_up, w2_scale=s_down,
                ln_scale=norm_2.scale,
                ln_bias=ln2b,
                eps=cfg.layer_norm_eps,
                act="gelu",
                residual=x2,
            )
            return y[:, None], LayerKV(k=kc, v=vc)

        h = norm_1(x)
        qkv = wqkv(h)
        if cfg.clip_qkv:
            qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.num_heads, cfg.head_dim)

        out, new_kv = cached_self_attention(
            q, k, v, attn, layer_kv,
            scale=cfg.head_dim**-0.5,
            alibi_slopes=slopes,
            bias=alibi_bias(cfg.num_heads, attn.kv_len, cfg.alibi_bias_max),
        )
        out = out_proj(merge_heads(out))
        x = x + out

        h = norm_2(x)
        h = up_proj(h)
        h = gelu_exact(h)
        h = down_proj(h)
        return x + h, new_kv
