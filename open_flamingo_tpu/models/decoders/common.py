"""Shared decoder infrastructure: configs, KV-cache pytrees, masks, RoPE.

The decode state is an explicit pytree (KVCache) threaded through forward —
the TPU-native replacement for HF's stateful past_key_values + the
reference's stateful layer conditioning (SURVEY.md §7 design stance).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Architecture config covering the reference's supported LM families
    (open_flamingo/src/factory.py:132-141): mpt, gptneox (Pythia /
    RedPajama-INCITE), llama, opt, gptj."""

    family: str
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    num_kv_heads: Optional[int] = None  # GQA (llama); None -> num_heads
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    # rotary
    rotary_pct: float = 1.0          # gptneox partial rotary
    rotary_dim: Optional[int] = None  # gptj explicit rotary dim
    rope_theta: float = 10000.0
    # family quirks
    use_parallel_residual: bool = True   # gptneox / gptj
    alibi: bool = False                  # mpt
    alibi_bias_max: float = 8.0
    clip_qkv: Optional[float] = None     # mpt
    attention_bias: bool = True          # gptneox has biases, mpt/llama not
    tie_word_embeddings: bool = True
    lm_head_bias: bool = False           # gptj has a biased lm head
    hidden_act: str = "gelu"             # llama: silu
    # mosaicml "mosaic_gpt" variants (OF-3B MPT-1B checkpoint) use LN
    # without bias; HF MptBlock also strips LN biases.
    ln_no_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads


@struct.dataclass
class LayerKV:
    """Head-major cache layout (B, H_kv, S_max, Dh): per-(batch, head)
    cache rows are contiguous, so the flash kernel's (B*H, S, D) view is
    a free reshape and the fused decode kernel streams blocks at DMA line
    rate (the (B, S, H, D) layout forced XLA into latency-bound chunked
    relayout copies of the whole cache every decode step).

    int8 cache (GenerationConfig.int8_kv): k/v are int8 with per-token
    symmetric scales k_s/v_s — halves the per-step cache DMA; the
    decode kernels dequantize in-register (logits *= k_s row, softmax
    weights *= v_s row) and quantize the new token in-kernel.

    Scale layout is HEAD-LEADING (H_kv, B, S_max) f32 (stacked:
    (G, H_kv, B, S_max)): Mosaic requires a block's last two dims to be
    (8,128)-divisible or full, so the per-head grid slices the leading
    head axis and streams full (B, S) planes — the (B, 1, S) layout's
    blocks are unlowerable."""

    k: jax.Array  # (B, H_kv, S_max, Dh); int8 when quantized
    v: jax.Array  # (B, H_kv, S_max, Dh)
    k_s: Optional[jax.Array] = None  # (H_kv, B, S_max) f32 scales
    v_s: Optional[jax.Array] = None

    @property
    def int8(self) -> bool:
        return self.k_s is not None


@struct.dataclass
class KVCache:
    """Decode-state pytree. `index` is the number of slots already filled;
    `pad_mask` marks valid (non-pad, written) key slots over S_max.

    `media` holds the per-xattn-layer projected media K/V, captured once at
    prefill (the media latents are static during decode, so re-projecting
    them every step — what the reference's per-step xattn does — is pure
    waste: ~1M params × num_xattn_layers of extra weight DMA and matmul
    FLOPs per generated token)."""

    layers: Tuple[LayerKV, ...]
    index: jax.Array      # scalar int32
    pad_mask: jax.Array   # (B, S_max) bool
    media: Optional[Tuple[LayerKV, ...]] = None

    @property
    def stacked(self) -> bool:
        """Scan layout: layers is a tuple of `n` group-stacked LayerKV
        (G, B, H, S, Dh) instead of num_layers per-layer (B, H, S, Dh)
        entries — kept stacked end-to-end so the decode loop never pays
        per-step stack/unstack copies."""
        return self.layers[0].k.ndim == 5

    @property
    def max_length(self) -> int:
        return self.layers[0].k.shape[3 if self.stacked else 2]

    @staticmethod
    def create(
        cfg: DecoderConfig, batch: int, max_length: int,
        dtype: Dtype = jnp.float32,
        scan_groups: Optional[int] = None,
        int8: bool = False,
    ) -> "KVCache":
        """scan_groups (scan_layers models): number of lax.scan groups
        G = num_layers // cross_attn_every_n; layers become
        cross_attn_every_n stacked (G, B, H, S, Dh) entries.

        int8: quantized cache (per-token scales, see LayerKV) — empty
        slots hold scale 1 (they stay masked)."""
        shape = (batch, cfg.kv_heads, max_length, cfg.head_dim)
        if scan_groups is not None:
            assert cfg.num_layers % scan_groups == 0
            n = cfg.num_layers // scan_groups
            shape = (scan_groups, *shape)
            count = n
        else:
            count = cfg.num_layers
        if int8:
            # scales are head-leading: (H, B, S) / (G, H, B, S)
            bhs = shape[:-1]
            sshape = (*bhs[:-3], bhs[-2], bhs[-3], bhs[-1])
            layer = LayerKV(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                k_s=jnp.ones(sshape, jnp.float32),
                v_s=jnp.ones(sshape, jnp.float32),
            )
        else:
            layer = LayerKV(
                k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype)
            )
        return KVCache(
            layers=tuple(layer for _ in range(count)),
            index=jnp.zeros((), jnp.int32),
            pad_mask=jnp.zeros((batch, max_length), bool),
        )


@struct.dataclass
class AttnInputs:
    """Per-forward attention context shared by every layer.

    mask:         (B, 1, Tq, Tk) bool, True = attend.
    position_ids: (B, Tq) int32 absolute positions (rotary / learned-pos).
    kv_slot:      scalar int32 — slot where this call's K/V are written
                  (0 for prefill / cache-free forward).
    kv_len:       static length of the key axis for this call.
    """

    mask: jax.Array
    position_ids: jax.Array
    kv_slot: jax.Array
    kv_len: int = struct.field(pytree_node=False)
    # (B, Tk) validity of each key slot — lets fused kernels rebuild the
    # mask as causal & pad without materializing (B, 1, Tq, Tk).
    pad_mask: Optional[jax.Array] = None
    # True when K/V come from a KVCache (head-major (B, H, S, D) layout).
    cached: bool = struct.field(pytree_node=False, default=False)


def position_ids_from_mask(attention_mask: jax.Array) -> jax.Array:
    """Left-padding-safe absolute positions: cumsum(mask)-1, clipped to 0.
    Matches the HF convention used by the eval harness's left-padded
    generation (open_flamingo/eval/models/open_flamingo.py:57)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)


def make_attn_inputs(
    attention_mask: jax.Array,
    *,
    cache: Optional[KVCache] = None,
) -> Tuple[AttnInputs, Optional[KVCache]]:
    """Build attention context for a forward call.

    attention_mask: (B, Tq) 1/0 over the *current* tokens. When `cache` is
    given, its pad_mask covers previously-written slots; current tokens are
    appended at slots [index, index+Tq).
    """
    b, tq = attention_mask.shape
    am = attention_mask.astype(bool)
    if cache is None:
        kv_len = tq
        q_pos = position_ids_from_mask(attention_mask)
        causal = (
            jax.lax.broadcasted_iota(jnp.int32, (tq, kv_len), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (tq, kv_len), 1)
        )
        mask = causal[None, None] & am[:, None, None, :]
        return (
            AttnInputs(
                mask=mask,
                position_ids=q_pos,
                kv_slot=jnp.zeros((), jnp.int32),
                kv_len=kv_len,
                pad_mask=am,
            ),
            None,
        )

    s_max = cache.max_length
    idx = cache.index
    # write current tokens' validity into the cache pad mask
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (b, s_max), 1)
    in_window = (slot_ids >= idx) & (slot_ids < idx + tq)
    # value for slot idx+i is attention_mask[:, i]
    gathered = jnp.take_along_axis(
        jnp.pad(am, ((0, 0), (0, s_max))),
        jnp.clip(slot_ids - idx, 0, tq - 1 + s_max),
        axis=1,
    )
    new_pad_mask = jnp.where(in_window, gathered, cache.pad_mask)

    # absolute positions: number of valid tokens before each current token
    prev_valid = jnp.sum(cache.pad_mask.astype(jnp.int32), axis=-1, keepdims=True)
    q_pos = prev_valid + jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    q_pos = jnp.maximum(q_pos, 0)

    # causal over slots: key slot j visible to query i iff j < idx + i + 1
    q_slot = idx + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
    k_slot = jax.lax.broadcasted_iota(jnp.int32, (1, s_max), 1)
    causal = k_slot <= q_slot  # (tq, s_max)
    mask = causal[None, None] & new_pad_mask[:, None, None, :]

    new_cache = cache.replace(pad_mask=new_pad_mask)
    return (
        AttnInputs(
            mask=mask,
            position_ids=q_pos,
            kv_slot=idx,
            kv_len=s_max,
            pad_mask=new_pad_mask,
            cached=True,
        ),
        new_cache,
    )


def quantize_kv(x: jax.Array):
    """Per-token symmetric int8 over the last (Dh) axis:
    (x_q int8, scale f32 with Dh removed — same leading layout as x)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x_q = jnp.clip(
        jnp.round(xf / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return x_q, scale


def kv_scale_layout(scale: jax.Array) -> jax.Array:
    """(..., B, H, S) <-> (..., H, B, S): swap to/from the head-leading
    scale layout the int8-cache kernels require (see LayerKV)."""
    return jnp.swapaxes(scale, -3, -2)


def update_layer_kv(
    layer_kv: Optional[LayerKV], k: jax.Array, v: jax.Array, attn: AttnInputs
) -> Tuple[jax.Array, jax.Array, Optional[LayerKV]]:
    """Write new K/V at the cache slot; return full key/value arrays.

    k/v arrive in the blocks' (B, T, H, D) layout. Without a cache they
    pass through unchanged; with a cache they are transposed into the
    head-major (B, H, S, D) cache layout and the returned full arrays use
    that layout too (self_attention dispatches on attn.cached). For
    single-token decode the transpose is a free reshape.

    int8 caches quantize the incoming tokens per (b, h, s) row and
    return DEQUANTIZED full arrays (so this call's attention sees
    exactly what later decode steps will read back).
    """
    if layer_kv is None:
        return k, v, None
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if layer_kv.int8:
        dtype = k.dtype
        k_q, k_s = quantize_kv(k)          # scales (B, H, T)
        v_q, v_s = quantize_kv(v)
        at = (0, 0, attn.kv_slot, 0)
        k_full = jax.lax.dynamic_update_slice(layer_kv.k, k_q, at)
        v_full = jax.lax.dynamic_update_slice(layer_kv.v, v_q, at)
        ks_full = jax.lax.dynamic_update_slice(
            layer_kv.k_s, kv_scale_layout(k_s), (0, 0, attn.kv_slot)
        )
        vs_full = jax.lax.dynamic_update_slice(
            layer_kv.v_s, kv_scale_layout(v_s), (0, 0, attn.kv_slot)
        )
        new = LayerKV(k=k_full, v=v_full, k_s=ks_full, v_s=vs_full)
        ks_bhs = kv_scale_layout(ks_full)[..., None]   # back to (B, H, S, 1)
        vs_bhs = kv_scale_layout(vs_full)[..., None]
        k_deq = (k_full.astype(jnp.float32) * ks_bhs).astype(dtype)
        v_deq = (v_full.astype(jnp.float32) * vs_bhs).astype(dtype)
        return k_deq, v_deq, new
    k_full = jax.lax.dynamic_update_slice(
        layer_kv.k, k.astype(layer_kv.k.dtype), (0, 0, attn.kv_slot, 0)
    )
    v_full = jax.lax.dynamic_update_slice(
        layer_kv.v, v.astype(layer_kv.v.dtype), (0, 0, attn.kv_slot, 0)
    )
    return k_full, v_full, LayerKV(k=k_full, v=v_full)


def repeat_kv(x: jax.Array, n_rep: int, head_axis: int = 2) -> jax.Array:
    """Grouped-query expansion along the head axis: head_axis=2 for the
    blocks' (B, S, H_kv, Dh) layout, 1 for the cache's (B, H_kv, S, Dh)."""
    if n_rep == 1:
        return x
    shape = list(x.shape)
    x = jnp.expand_dims(x, head_axis + 1)
    shape_b = shape[: head_axis + 1] + [n_rep] + shape[head_axis + 1 :]
    shape[head_axis] *= n_rep
    return jnp.broadcast_to(x, shape_b).reshape(shape)


# --- rotary embeddings (HF-compatible) ------------------------------------


def rope_cos_sin(
    position_ids: jax.Array, rotary_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables, HF layout: emb = concat(freqs, freqs).

    position_ids: (B, T) -> cos/sin (B, T, rotary_dim), fp32.
    """
    inv_freq = 1.0 / (
        theta
        ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Apply (possibly partial) rotary embedding.

    q/k: (B, T, H, Dh); cos/sin: (B, T, rotary_dim). The first rotary_dim
    channels are rotated, the rest pass through (HF apply_rotary_pos_emb).
    """
    rd = cos.shape[-1]
    cos = cos[:, :, None, :].astype(q.dtype)
    sin = sin[:, :, None, :].astype(q.dtype)

    def rot(x):
        x_rot, x_pass = x[..., :rd], x[..., rd:]
        x_rot = x_rot * cos + _rotate_half(x_rot) * sin
        return jnp.concatenate([x_rot, x_pass], axis=-1) if x_pass.shape[-1] else x_rot

    return rot(q), rot(k)


def apply_rope_interleaved(
    q: jax.Array,
    k: jax.Array,
    position_ids: jax.Array,
    rotary_dim: int,
    theta: float = 10000.0,
) -> Tuple[jax.Array, jax.Array]:
    """GPT-J-style rotary: pairs are interleaved (rotate_every_two) rather
    than split-half (HF gptj.apply_rotary_pos_emb semantics).

    q/k: (B, T, H, Dh); first rotary_dim channels rotated.
    """
    half = rotary_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim)
    )
    freqs = position_ids[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)[:, :, None, :]  # (B,T,1,rd)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)[:, :, None, :]

    def rotate_every_two(x):
        x1 = x[..., ::2]
        x2 = x[..., 1::2]
        return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)

    def rot(x):
        xr, xp = x[..., :rotary_dim], x[..., rotary_dim:]
        xr = xr * cos.astype(x.dtype) + rotate_every_two(xr) * sin.astype(x.dtype)
        return jnp.concatenate([xr, xp], axis=-1) if xp.shape[-1] else xr

    return rot(q), rot(k)


def alibi_slopes(num_heads: int, bias_max: float = 8.0):
    """MPT-style ALiBi slopes (HF build_mpt_alibi_tensor semantics).

    Returned as a static numpy array — the slopes depend only on the
    (static) head count, so kernels can bake them in as constants."""
    import math

    import numpy as np

    p = 2 ** math.ceil(math.log2(num_heads))
    base = np.arange(1, p + 1, dtype=np.float32) * (bias_max / p)
    slopes = 1.0 / np.power(2.0, base)
    if p != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes


def alibi_bias(num_heads: int, kv_len: int, bias_max: float = 8.0) -> jax.Array:
    """(1, H, 1, kv_len) additive bias: slope_h * (j - (kv_len - 1)).

    Key-position-only form — matches HF MPT (translation invariance of
    softmax), and is what makes ALiBi free during cached decode."""
    slopes = alibi_slopes(num_heads, bias_max)
    dist = jnp.arange(1 - kv_len, 1, dtype=jnp.float32)
    return (slopes[:, None, None] * dist[None, None, :])[None]
