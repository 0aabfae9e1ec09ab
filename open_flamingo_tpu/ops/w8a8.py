"""W8A8 int8 matmul for the MXU-bound prefill/vision path.

Single-token decode is DMA-bound, so int8 there only needs quantized
WEIGHTS (ops/dense_stream.py streams them at half the bytes). Prefill
and the ViT forward are the opposite regime — compute-bound matmuls at
~86-90% of the bf16 MXU floor (BASELINE.md) — so the remaining lever is
the int8 MXU rate itself: measured on this v5e, int8xint8->int32 runs
~1.45x bf16 at square shapes and ~1.2x at prefill shapes
(scripts_dev/tpu_int8_matmul_probe2.py). That needs BOTH operands int8:
weights use the static per-out-channel scales (quantize.py), and
activations are quantized dynamically per row (symmetric amax/127 over
the reduction axis — the standard W8A8 dynamic-quant recipe).

The matmul dequantizes exactly: y = (x_q . w_q) * x_s * w_s, with the
int32 accumulator cast to f32 before the two rank-1 scale multiplies,
so the only error is the input rounding.

Gating: module-global ENABLED (set by generate/eval entrypoints via
--int8_prefill) AND a per-call shape gate — at least MIN_TOKENS rows,
so the einsum decode fallback (T=1) and small utility matmuls stay
bf16. PDense (models/layers.py) consults this module when a `qparams`
collection is bound.

Replaced torch path: none — the reference runs fp32/bf16 prefill
(open_flamingo/src/flamingo.py:161-175); this is TPU-roofline work.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Set by eval/bench entrypoints (--int8_prefill). Trace-time constant:
# flip BEFORE tracing/jitting the forward.
ENABLED = False
# Engage only when the matmul has at least this many rows (tokens) —
# below this the launch is latency/DMA-bound and bf16 is free.
MIN_TOKENS = 16


def use_w8a8(x: jax.Array) -> bool:
    """Shape gate for an (..., T, K) activation."""
    return ENABLED and x.ndim >= 3 and x.shape[-2] >= MIN_TOKENS


def quantize_activations(x: jax.Array):
    """Dynamic symmetric per-row int8: (x_q int8, x_s f32 keepdims).
    Zero rows quantize to zeros with scale 1 (exact)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    x_q = jnp.clip(jnp.round(xf / x_s), -127, 127).astype(jnp.int8)
    return x_q, x_s


def w8a8_dot(
    x: jax.Array,                  # (..., K) float
    w_q: jax.Array,                # (K, N) int8
    w_s: jax.Array,                # (N,) f32 per-out-channel scales
    bias: Optional[jax.Array] = None,
    out_dtype=None,
) -> jax.Array:
    """Dynamic-activation int8 matmul: quantize rows of x, multiply on
    the int8 MXU path with an int32 accumulator, dequantize with the
    two rank-1 scales."""
    x_q, x_s = quantize_activations(x)
    y = jax.lax.dot_general(
        x_q, w_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * x_s * w_s.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)
