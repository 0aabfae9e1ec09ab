"""One-pass Pallas LayerNorm for big activation tensors (library code;
OFF by default — see use_ln_kernel's measured refutation).

Computes the whole LN (fp32 stats with flax fast-variance semantics +
scale/bias) in one streaming pass over row blocks. Built to test the
hypothesis that the ViT's 400 us/LN convert_reduce fusions were
stalled; on-TPU measurement showed those fusions carry overlapped
matmul wait time, and replacing them with this kernel materializes an
extra activation pass (ViT 51.8 vs 43.9 ms device) — so XLA's fused
path stays the default.

Flax-parity: var = max(0, E[x^2] - E[x]^2), fp32 math, cast to the
input dtype (models/layers.py PLayerNorm / nn.LayerNorm defaults).

Backward: custom_vjp recomputes through the reference formula (the ViT
is frozen in every released config; training through it is a
correctness fallback).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hooks (see ops/dense_stream.py conventions)
FORCE = False
DISABLE = False
INTERPRET = False


def use_ln_kernel() -> bool:
    """Default OFF: measured on-TPU (r3), the standalone LN kernel
    materializes its output where XLA's fused convert_reduce feeds
    consumers directly — the ViT got ~7 ms SLOWER (51.8 vs 43.9 ms
    device). The 400 us/LN "stalls" were matmul time hiding in fusion
    accounting, not fixable LN cost. Kept + FORCE hook; BASELINE.md."""
    if DISABLE:
        return False
    return FORCE


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps, has_bias):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    )
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[0].astype(jnp.float32)
    if has_bias:
        y = y + b_ref[0].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def layer_norm(
    x: jax.Array,             # (..., M, D) normalized over D
    scale: jax.Array,         # (D,)
    bias: Optional[jax.Array],
    *,
    eps: float = 1e-5,
    block_m: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    interpret = INTERPRET if interpret is None else interpret
    shape = x.shape
    d = shape[-1]
    x2 = x.reshape(-1, d)
    m = x2.shape[0]
    block_m = min(block_m, m)

    operands = [x2, jnp.asarray(scale).reshape(1, d)]
    in_specs = [
        pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        pl.BlockSpec((1, d), lambda i: (0, 0)),
    ]
    has_bias = bias is not None
    if has_bias:
        operands.append(jnp.asarray(bias).reshape(1, d))
        in_specs.append(pl.BlockSpec((1, d), lambda i: (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, has_bias=has_bias),
        grid=(pl.cdiv(m, block_m),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(*operands)
    return out.reshape(shape)


def _reference_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0,
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu),
    )
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def layer_norm_vjp(x, scale, bias, eps: float = 1e-5, block_m: int = 512):
    """layer_norm with an einsum-recompute backward (frozen-ViT use)."""
    return layer_norm(x, scale, bias, eps=eps, block_m=block_m)


def _fwd(x, scale, bias, eps, block_m):
    return layer_norm(x, scale, bias, eps=eps, block_m=block_m), (
        x, scale, bias,
    )


def _bwd(eps, block_m, res, g):
    x, scale, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda x, s: _reference_ln(x, s, None, eps), x, scale)
        dx, ds = vjp(g)
        return dx, ds, None
    _, vjp = jax.vjp(
        lambda x, s, b: _reference_ln(x, s, b, eps), x, scale, bias
    )
    return vjp(g)


layer_norm_vjp.defvjp(_fwd, _bwd)
