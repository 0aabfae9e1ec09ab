"""Gated cross-attention: text queries attend to media latents.

Capability parity with open_flamingo/src/helpers.py:136-279, re-designed
functionally: instead of the reference's stateful `condition_*` attributes
(open_flamingo/src/flamingo_lm.py:30-37), the media latents and the
per-token media time (`text_time`) are explicit arguments threaded through
the decoder.

Media-time masking semantics (open_flamingo/src/helpers.py:196-229):
  * media_time[j] = j + 1 for the j-th image (1-indexed).
  * text_time[i]  = cumsum(media_locations)[i] for a full forward, or the
    total number of cached media for decode steps (`use_cached_media`).
  * attend iff text_time == media_time ("immediate" mode, default) or
    text_time >= media_time ("all previous" mode).
  * in immediate mode, text positions with text_time == 0 (no preceding
    image) get their attention output zeroed AFTER softmax.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    LN_EPS,
    FeedForward,
    PDense,
    PLayerNorm,
    merge_heads,
    split_heads,
)

Dtype = Any


def media_time_from_locations(media_locations: jax.Array) -> jax.Array:
    """text_time for a full forward: cumulative count of media tokens.

    media_locations: (B, T_txt) bool -> (B, T_txt) int32.
    """
    return jnp.cumsum(media_locations.astype(jnp.int32), axis=-1)


def use_xattn_kernel(tq: int, immediate: bool) -> bool:
    """Whether MaskedCrossAttention dispatches to the fused Pallas kernel
    (which computes the media-time mask in-kernel from text_time)."""
    return immediate and tq >= 8 and jax.default_backend() == "tpu"


def build_media_masks(
    text_time: jax.Array, t_img: int, n_lat: int, immediate: bool
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Media-time mask for the einsum path, built ONCE per forward (it is
    identical for every xattn layer — the decode hot path used to rebuild
    it per layer).

    Returns (mask (B,1,T_txt,T_img*n_lat) bool, zero_rows or None).
    """
    media_time = (
        jax.lax.broadcasted_iota(jnp.int32, (t_img, n_lat), 0).reshape(-1) + 1
    )
    tt = text_time[:, None, :, None]          # (B, 1, T_txt, 1)
    mt = media_time[None, None, None, :]      # (1, 1, 1, T_img*n)
    if immediate:
        return tt == mt, (text_time == 0)[:, None, :, None]
    return tt >= mt, None


def cached_media_text_time(
    media_locations: jax.Array, t_txt: int
) -> jax.Array:
    """text_time for decode steps: every position attends as if it follows
    the last cached image (open_flamingo/src/helpers.py:199-205)."""
    count = jnp.sum(media_locations.astype(jnp.int32), axis=-1, keepdims=True)
    return jnp.broadcast_to(count, (media_locations.shape[0], t_txt))


class MaskedCrossAttention(nn.Module):
    """Text -> media-latents cross attention with media-time masking."""

    dim: int
    dim_visual: int
    dim_head: int = 64
    heads: int = 8
    only_attend_immediate_media: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        media: jax.Array,
        text_time: jax.Array,
        media_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        media_mask: Optional[jax.Array] = None,
        zero_rows: Optional[jax.Array] = None,
        out_gate: Optional[jax.Array] = None,
        out_residual: Optional[jax.Array] = None,
        mlp: Optional[dict] = None,
    ) -> jax.Array:
        """
        x:          (B, T_txt, D_txt) text features
        media:      (B, T_img, n_latents, D_vis)
        text_time:  (B, T_txt) int — media-time index of each text position.
        media_kv:   optional precomputed (k, v), each head-major
                    (B, H, S_m, Dh) — the media projection is static during
                    decode, so generate() computes it once at prefill and
                    reuses it every step (the reference recomputes it per
                    HF decode step).
        media_mask: optional precomputed mask (B,1,T_txt,S_m) bool — it is
                    layer-independent, so FlamingoLM builds it once.
        zero_rows:  goes with media_mask (immediate-mode zeroing).
        out_gate/out_residual: optional tanh-gate + residual folded into
                    the output projection (fused into the decode kernel
                    on the fast path; applied after to_out otherwise).
        """
        b, t_img, n_lat, _ = media.shape
        inner = self.dim_head * self.heads
        dense = dict(use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype)
        from ..ops.dense_stream import use_fused_decode

        norm = PLayerNorm(
            self.dim, epsilon=LN_EPS, dtype=self.dtype,
            param_dtype=self.param_dtype, name="norm",
        )
        to_q = PDense(self.dim, inner, **dense, name="to_q")
        to_out_mod = PDense(inner, self.dim, **dense, name="to_out")

        tq0 = x.shape[1]
        if (
            media_kv is not None
            and use_fused_decode(tq0, True)
            and self.only_attend_immediate_media
        ):
            return self._fused_decode(
                x, media_kv, text_time, t_img, n_lat,
                norm, to_q, to_out_mod, out_gate, out_residual, mlp,
            )

        x = norm(x)
        q = to_q(x)
        if media_kv is None:
            media_flat = media.reshape(b, t_img * n_lat, media.shape[-1])
            kv = nn.Dense(inner * 2, **dense, name="to_kv")(media_flat)
            k, v = jnp.split(kv, 2, axis=-1)
            # head-major (B, H, S_m, Dh): matches the KV-cache layout so
            # the fused kernels' (B*H, S, D) views are free reshapes.
            k = split_heads(k, self.heads).transpose(0, 2, 1, 3)
            v = split_heads(v, self.heads).transpose(0, 2, 1, 3)
            # capture for decode reuse: flamingo_generate pulls this out of
            # the prefill call (apply(..., mutable=["media_kv"])) and stores
            # it in the KV cache so decode steps skip the projection.
            if not self.is_initializing():
                self.sow("media_kv", "kv", (k, v))
        else:
            k, v = media_kv

        q = split_heads(q, self.heads)

        h = self.heads
        d = self.dim_head
        s = t_img * n_lat
        tq = q.shape[1]
        scale = self.dim_head**-0.5
        on_tpu = jax.default_backend() == "tpu"
        if use_xattn_kernel(tq, self.only_attend_immediate_media):
            # fused Pallas path: media-time mask computed in-kernel
            from ..ops.masked_xattn import masked_xattn

            qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
            kf = k.reshape(b * h, s, d)
            vf = v.reshape(b * h, s, d)
            tt_h = jnp.repeat(text_time.astype(jnp.int32), h, axis=0)
            out = masked_xattn(qf, kf, vf, tt_h, n_lat, scale)
            out = out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
        elif tq == 1 and self.only_attend_immediate_media and on_tpu:
            # fused single-token decode: the media mask is one row per
            # sequence (text_time is constant within a decode step), and
            # text with no preceding image (all-masked row) comes out as
            # exact zeros from the kernel — the immediate-mode rule.
            from ..ops.decode_attention import decode_attention

            media_time = (
                jax.lax.broadcasted_iota(jnp.int32, (t_img, n_lat), 0)
                .reshape(-1) + 1
            )
            mask2d = text_time[:, :1] == media_time[None, :]   # (B, S_m)
            out = decode_attention(q[:, 0], k, v, mask2d, scale=scale)
            out = out[:, None]
        else:
            if media_mask is None:
                media_mask, zero_rows = build_media_masks(
                    text_time, t_img, n_lat, self.only_attend_immediate_media
                )
            from ..ops.attention import _attend_cached

            out = _attend_cached(
                q * scale, k, v, mask=media_mask, zero_rows=zero_rows
            )
        out = merge_heads(out)
        out = to_out_mod(out)
        if out_gate is not None:
            out = out * jnp.tanh(out_gate)
        if out_residual is not None:
            out = out + out_residual
        return out

    def _fused_decode(
        self, x, media_kv, text_time, t_img, n_lat,
        norm, to_q, to_out_mod, out_gate, out_residual, mlp=None,
    ):
        """Single-token decode: LN+q-proj runs as a weight-streaming
        kernel; the media-time-masked attend over cached media K/V, the
        output projection, the tanh gate, and the residual merge into one
        head-grid launch — and when the caller hands over its FF half
        (`mlp` dict), the WHOLE gated block becomes one launch
        (ops/fused_layer.py). Rows whose text has no preceding image
        (all-masked) contribute exact zeros — the immediate-mode rule."""
        from ..ops.decode_layer import attend_out_decode, attn_block_decode
        from ..ops.dense_stream import fused_dense

        k, v = media_kv
        b = x.shape[0]
        media_time = (
            jax.lax.broadcasted_iota(jnp.int32, (t_img, n_lat), 0)
            .reshape(-1) + 1
        )
        mask2d = text_time[:, :1] == media_time[None, :]   # (B, S_m)
        w_q, s_q = to_q.stream_weight()
        w_o, s_o = to_out_mod.stream_weight()
        if mlp is not None and out_gate is not None and out_residual is not None:
            from ..ops.fused_layer import fused_layer_decode

            y = fused_layer_decode(
                x[:, 0], norm.scale, norm.bias,
                w_q, w_o, k, v, mask2d,
                mlp["w1"], mlp["w2"], mlp["ln_scale"], mlp["ln_bias"],
                heads=self.heads, head_dim=self.dim_head,
                scale=self.dim_head**-0.5, act="gelu",
                gate=out_gate, gate2=mlp["gate"],
                wq_scale=s_q, wout_scale=s_o,
                w1_scale=mlp["w1_scale"], w2_scale=mlp["w2_scale"],
                eps=LN_EPS,
            )
            return y[:, None]
        if out_gate is not None and out_residual is not None:
            # gated path: one launch for the whole attention half
            y = attn_block_decode(
                x[:, 0], norm.scale, norm.bias,
                w_q,
                w_o,
                k, v, mask2d,
                heads=self.heads, head_dim=self.dim_head,
                scale=self.dim_head**-0.5, gate=out_gate, eps=LN_EPS,
                wq_scale=s_q, wout_scale=s_o,
            )
            return y[:, None]

        q = fused_dense(
            x[:, 0], w_q, w_scale=s_q,
            ln_scale=norm.scale, ln_bias=norm.bias, eps=LN_EPS,
        )
        out = attend_out_decode(
            q.reshape(b, self.heads, self.dim_head), k, v, mask2d,
            w_o.reshape(self.heads, self.dim_head, self.dim),
            scale=self.dim_head**-0.5,
            wout_scale=s_o,
            gate=out_gate,
            residual=None if out_residual is None else out_residual[:, 0],
        )
        return out[:, None]


class GatedCrossAttentionBlock(nn.Module):
    """x = xattn(x)*tanh(g_attn) + x; x = ff(x)*tanh(g_ff) + x.

    Gates init to 0 so the wrapped LM is untouched at init
    (open_flamingo/src/helpers.py:236-279).
    """

    dim: int
    dim_visual: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    only_attend_immediate_media: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        media: jax.Array,
        text_time: jax.Array,
        media_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        media_mask: Optional[jax.Array] = None,
        zero_rows: Optional[jax.Array] = None,
    ) -> jax.Array:
        attn_gate = self.param(
            "attn_gate", nn.initializers.zeros, (1,), self.param_dtype
        ).astype(self.dtype)
        ff_gate = self.param(
            "ff_gate", nn.initializers.zeros, (1,), self.param_dtype
        ).astype(self.dtype)

        from ..ops.dense_stream import use_fused_decode

        fused = (
            media_kv is not None
            and use_fused_decode(x.shape[1], True)
            and self.only_attend_immediate_media
        )

        xattn = MaskedCrossAttention(
            dim=self.dim,
            dim_visual=self.dim_visual,
            dim_head=self.dim_head,
            heads=self.heads,
            only_attend_immediate_media=self.only_attend_immediate_media,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="attn",
        )
        ff = FeedForward(
            dim=self.dim,
            mult=self.ff_mult,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ff",
        )

        if fused:
            from ..ops import fused_layer
            from ..ops.dense_stream import fused_mlp

            w_1, s_1 = ff.fc1.stream_weight()
            w_2, s_2 = ff.fc2.stream_weight()
            if fused_layer.use_for_xattn():
                # decode: the WHOLE gated block in one launch (masked
                # attend over cached media K/V + out-proj + attn gate +
                # residual, then the FF with its own gate) — the MLP
                # half rides the attention module's launch
                # (ops/fused_layer.py phase grid)
                return xattn(
                    x, media, text_time, media_kv, media_mask, zero_rows,
                    out_gate=attn_gate, out_residual=x,
                    mlp=dict(
                        w1=w_1, w2=w_2, w1_scale=s_1, w2_scale=s_2,
                        ln_scale=ff.norm.scale, ln_bias=ff.norm.bias,
                        gate=ff_gate,
                    ),
                )

            # two-launch path (A/B hook)
            x = xattn(
                x, media, text_time, media_kv, media_mask, zero_rows,
                out_gate=attn_gate, out_residual=x,
            )
            y = fused_mlp(
                x[:, 0],
                w_1,
                w_2,
                w1_scale=s_1, w2_scale=s_2,
                ln_scale=ff.norm.scale, ln_bias=ff.norm.bias, eps=LN_EPS,
                act="gelu",
                residual=x[:, 0],
                gate=ff_gate,
            )
            return y[:, None]

        attn_out = xattn(x, media, text_time, media_kv, media_mask, zero_rows)
        x = attn_out * jnp.tanh(attn_gate) + x

        ff_out = ff(x)
        x = ff_out * jnp.tanh(ff_gate) + x
        return x
