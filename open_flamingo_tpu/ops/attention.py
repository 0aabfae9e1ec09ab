"""Self-attention dispatcher: fused Pallas flash kernel on TPU for
multi-token calls, reference einsum path elsewhere (single-token decode
is K/V-bandwidth-bound; fusion buys nothing there)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.layers import attend


def _use_flash(q, attn) -> bool:
    if q.shape[1] < 8:  # decode / tiny prefill: einsum path
        return False
    if attn.pad_mask is None:
        return False
    return jax.default_backend() == "tpu"


def self_attention(
    q: jax.Array,       # (B, Tq, H, Dh)
    k: jax.Array,       # (B, S, H, Dh)
    v: jax.Array,
    attn,               # AttnInputs
    *,
    scale: float,
    alibi_slopes: Optional[jax.Array] = None,  # (H,) f32
    bias: Optional[jax.Array] = None,          # fallback-path extra bias
    force_flash: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, Tq, H, Dh)."""
    use_flash = _use_flash(q, attn) if force_flash is None else force_flash
    b, tq, h, d = q.shape
    s = k.shape[1]

    if use_flash:
        from .flash_attention import flash_attention

        qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
        kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
        pad = jnp.repeat(attn.pad_mask.astype(jnp.int32), h, axis=0)
        if alibi_slopes is None:
            slopes = jnp.zeros((b * h, 1), jnp.float32)
        else:
            slopes = jnp.tile(alibi_slopes.astype(jnp.float32), b)[:, None]
        out = flash_attention(
            qf, kf, vf, pad, slopes, attn.kv_slot,
            True, scale,
        )
        return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)

    if alibi_slopes is not None and bias is None:
        from ..models.decoders.common import alibi_bias

        bias = alibi_bias(h, s)
    return attend(q * scale, k, v, bias=bias, mask=attn.mask)
