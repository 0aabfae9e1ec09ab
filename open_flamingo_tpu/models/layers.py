"""Shared neural building blocks (Flax linen).

TPU-first conventions used throughout the framework:
  * params live in fp32 (`param_dtype`), compute runs in `dtype`
    (bf16 on TPU, fp32 for parity tests) — the canonical TPU mixed
    precision recipe (reference keeps fp32 params w/ bf16 reduce,
    open_flamingo/train/train.py:317-326).
  * attention softmax always in fp32.
  * no dynamic shapes; masks are computed with broadcasted iota.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch.nn.LayerNorm default eps — flax defaults to 1e-6, which breaks
# checkpoint parity with the reference stack.
LN_EPS = 1e-5


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU, matching torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


class PDense(nn.Module):
    """nn.Dense with setup()-declared params so fused decode kernels can
    read `.kernel`/`.bias` as raw arrays (nn.Dense hides them inside its
    compact scope). Same param tree ("<name>/kernel", "<name>/bias") and
    identical numerics to nn.Dense."""

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        # int8-resident mode (quantize.strip_resident_params): the bf16
        # kernel is dropped from params so only the int8 side-car stays
        # in HBM (OF-9B fits a single 16GB chip). Declare the param only
        # when it exists (or at init); consumers that still need a dense
        # weight dequantize the int8 copy in-graph (transient, fused).
        if (
            self.is_initializing()
            or self.has_variable("params", "kernel")
            or not self.has_variable("qparams", "kernel_q")
        ):
            self.kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (self.in_features, self.features),
                self.param_dtype,
            )
        else:
            self.kernel = None
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )

    def _dense_kernel(self) -> jax.Array:
        if self.kernel is not None:
            return self.kernel
        q = self.get_variable("qparams", "kernel_q")
        s = self.get_variable("qparams", "kernel_s")
        return q.astype(self.dtype) * s.astype(self.dtype)

    def _w8a8_weight(self):
        """int8 weight for the W8A8 MXU path, or None. int4 mode stores
        the int4-grid values as int8 in kernel_q4 (activate_int4_stream
        keeps it alongside the S4 decode stream) — same dequant math,
        so prefill and decode see identical weights."""
        if self.has_variable("qparams", "kernel_q"):
            q = self.get_variable("qparams", "kernel_q")
            if q.dtype == jnp.int8:
                return q
        if self.has_variable("qparams", "kernel_q4"):
            return self.get_variable("qparams", "kernel_q4")
        return None

    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops import w8a8

        bias = self.bias if self.use_bias else None
        w_q = self._w8a8_weight() if w8a8.use_w8a8(x) else None
        if w_q is not None:
            # W8A8 prefill: both operands int8 -> int8 MXU rate
            # (ops/w8a8.py); opt-in via --int8_prefill
            return w8a8.w8a8_dot(
                x,
                w_q,
                self.get_variable("qparams", "kernel_s"),
                bias=bias,
                out_dtype=self.dtype,
            )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, self._dense_kernel(), bias, dtype=self.dtype
        )
        y = jnp.dot(x, kernel)
        if bias is not None:
            y = y + bias
        return y

    def stream_weight(self):
        """(w, w_scale) for the weight-streaming decode kernels: the
        int8 copy + per-out-channel scale when a `qparams` collection is
        bound (quantize.quantize_decode_params), else (dtype-cast
        kernel, None). Halves the decode DMA when quantized (and is the
        ONLY resident copy under strip_resident_params)."""
        if self.has_variable("qparams", "kernel_q"):
            return (
                self.get_variable("qparams", "kernel_q"),
                self.get_variable("qparams", "kernel_s"),
            )
        return self.kernel.astype(self.dtype), None


class PLayerNorm(nn.Module):
    """nn.LayerNorm with setup()-declared params (see PDense). Mirrors
    flax semantics exactly: f32 stats with fast variance
    (max(0, E[x^2]-E[x]^2)), f32 normalize/scale/bias, cast to dtype."""

    features: int
    epsilon: float = LN_EPS
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )

    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mean2 - jnp.square(mean))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale.astype(jnp.float32)
        if self.use_bias:
            y = y + self.bias.astype(jnp.float32)
        return y.astype(self.dtype)


class FeedForward(nn.Module):
    """LayerNorm -> Dense(mult*dim, no bias) -> GELU -> Dense(dim, no bias).

    Mirrors the reference FeedForward (open_flamingo/src/helpers.py:15-22).
    """

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = int(self.dim * self.mult)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.norm = PLayerNorm(self.dim, epsilon=LN_EPS, **kw)
        self.fc1 = PDense(self.dim, inner, use_bias=False, **kw)
        self.fc2 = PDense(inner, self.dim, use_bias=False, **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.norm(x)
        x = self.fc1(x)
        x = gelu_exact(x)
        x = self.fc2(x)
        return x


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    zero_rows: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference scaled-dot-product attention core (einsum path).

    q: (..., Tq, H, Dh) pre-scaled by caller; k/v: (..., Tk, H, Dh).
    bias: broadcastable to (..., H, Tq, Tk), added to logits.
    mask: bool broadcastable to (..., H, Tq, Tk); False -> masked out.
    zero_rows: bool broadcastable to (..., H, Tq, 1); True -> output row
        forced to zero AFTER softmax (reference semantics for text with no
        preceding media, open_flamingo/src/helpers.py:223-229).

    Softmax in fp32 with max-subtraction. Fully-masked rows produce a
    uniform distribution (matching torch masked_fill(-max) + softmax).
    """
    logits = jnp.einsum(
        "...qhd,...khd->...hqk", q, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask, logits, neg)
    # jax.nn.softmax subtracts the (stop-gradient) row max internally —
    # matching the reference's explicit amax subtraction (helpers.py:220)
    probs = jax.nn.softmax(logits, axis=-1)
    if zero_rows is not None:
        probs = jnp.where(zero_rows, 0.0, probs)
    probs = probs.astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


def split_heads(x: jax.Array, heads: int) -> jax.Array:
    """(..., T, H*Dh) -> (..., T, H, Dh)."""
    return x.reshape(*x.shape[:-1], heads, x.shape[-1] // heads)


def merge_heads(x: jax.Array) -> jax.Array:
    """(..., T, H, Dh) -> (..., T, H*Dh)."""
    return x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])
