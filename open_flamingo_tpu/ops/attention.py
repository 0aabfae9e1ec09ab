"""Self-attention dispatcher.

Three regimes, selected by query length and cache state:
  * multi-token on TPU -> fused Pallas flash kernel (streaming softmax);
  * single-token decode against a cache on TPU -> fused Pallas decode
    kernel (streams the head-major cache at DMA line rate — XLA's einsum
    lowering for this shape copies the whole cache per step);
  * otherwise -> reference einsum path.

K/V layout: (B, T, H, D) for cache-free calls, head-major (B, H, S, D)
when they come from a KVCache (attn.cached — see models/decoders/common).
q is always (B, Tq, H, D) and the result is always (B, Tq, H, D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.layers import attend


def _use_flash(q, attn) -> bool:
    if q.shape[1] < 8:  # decode / tiny prefill: einsum or decode kernel
        return False
    if attn.pad_mask is None:
        return False
    return jax.default_backend() == "tpu"


def _attend_cached(q, k, v, *, bias=None, mask=None, zero_rows=None):
    """Einsum reference over the head-major cache layout.

    q: (B, Tq, H, D); k/v: (B, H, S, D); same semantics as layers.attend
    (fp32 softmax, fully-masked rows uniform, optional post-softmax
    zeroing of rows flagged by zero_rows (B, 1, Tq, 1))."""
    logits = jnp.einsum(
        "bqhd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    if zero_rows is not None:
        probs = jnp.where(zero_rows, 0.0, probs)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bqhd", probs, v)


def cached_self_attention(
    q: jax.Array,       # (B, T, H, Dh) block outputs
    k: jax.Array,       # (B, T, H_kv, Dh)
    v: jax.Array,
    attn,               # AttnInputs
    layer_kv,           # Optional[LayerKV]
    *,
    scale: float,
    alibi_slopes=None,  # static (H,) numpy ALiBi slopes
    bias: Optional[jax.Array] = None,
    n_rep: int = 1,     # GQA expansion factor
    force_flash: Optional[bool] = None,
):
    """Cache update + attention in one call. On the TPU decode path
    (single token, MHA) the update is fused INTO the attention kernel —
    no dynamic_update_slice ever appears in the decode graph (XLA's DUS
    lowering promoted the whole cache to VMEM through latency-bound
    chunked copies). Returns (out (B, T, H, Dh), new LayerKV or None)."""
    from ..models.decoders.common import LayerKV, repeat_kv, update_layer_kv

    tq = q.shape[1]
    if (
        layer_kv is not None
        and not layer_kv.int8
        and tq == 1
        and n_rep == 1
        and attn.pad_mask is not None
        and force_flash is None
        and jax.default_backend() == "tpu"
    ):
        from .decode_attention import decode_attention_update

        out, kc, vc = decode_attention_update(
            q[:, 0], layer_kv.k, layer_kv.v, k[:, 0], v[:, 0],
            attn.pad_mask, attn.kv_slot,
            scale=scale, slopes=alibi_slopes,
        )
        return out[:, None], LayerKV(k=kc, v=vc)

    k_full, v_full, new_kv = update_layer_kv(layer_kv, k, v, attn)
    if n_rep > 1:
        head_axis = 1 if attn.cached else 2
        k_full = repeat_kv(k_full, n_rep, head_axis)
        v_full = repeat_kv(v_full, n_rep, head_axis)
    out = self_attention(
        q, k_full, v_full, attn,
        scale=scale, alibi_slopes=alibi_slopes, bias=bias,
        force_flash=force_flash,
    )
    return out, new_kv


def self_attention(
    q: jax.Array,       # (B, Tq, H, Dh)
    k: jax.Array,       # (B, Tq, H, Dh) or (B, H, S, Dh) when attn.cached
    v: jax.Array,
    attn,               # AttnInputs
    *,
    scale: float,
    alibi_slopes=None,  # static (H,) numpy ALiBi slopes
    bias: Optional[jax.Array] = None,          # fallback-path extra bias
    force_flash: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, Tq, H, Dh)."""
    use_flash = _use_flash(q, attn) if force_flash is None else force_flash
    b, tq, h, d = q.shape
    s = attn.kv_len

    if use_flash:
        from .flash_attention import flash_attention

        qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
        if attn.cached:
            kf = k.reshape(b * h, s, d)   # head-major: free reshape
            vf = v.reshape(b * h, s, d)
        else:
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

    if (
        attn.cached
        and tq == 1
        and attn.pad_mask is not None
        and jax.default_backend() == "tpu"
    ):
        # fused decode kernel. For a single query token the causal mask is
        # implied by the cache pad mask (only written, non-pad slots are
        # marked valid, and the current token's slot is written first).
        from .decode_attention import decode_attention

        out = decode_attention(
            q[:, 0], k, v, attn.pad_mask, scale=scale, slopes=alibi_slopes,
        )
        return out[:, None]

    if alibi_slopes is not None and bias is None:
        from ..models.decoders.common import alibi_bias

        bias = alibi_bias(h, s)
    if attn.cached:
        return _attend_cached(q * scale, k, v, bias=bias, mask=attn.mask)
    return attend(q * scale, k, v, bias=bias, mask=attn.mask)
