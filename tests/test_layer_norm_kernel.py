"""Pallas LayerNorm kernel parity + ViT-with-kernels equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.ops.layer_norm import layer_norm, layer_norm_vjp


@pytest.mark.parametrize("m,d,blk", [(24, 64, 8), (100, 128, 32)])
def test_layer_norm_matches_flax(rng, m, d, blk):
    from flax import linen as nn

    x = jnp.asarray(rng.normal(size=(m, d)) * 2 + 1, jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)), jnp.float32)
    got = layer_norm(x, scale, bias, eps=1e-5, block_m=blk, interpret=True)
    ref = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_layer_norm_grad_matches(rng):
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.normal(size=(32,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(32,)), jnp.float32)

    def loss_k(x, s, b):
        return jnp.sum(layer_norm_vjp(x, s, b, 1e-5, 8) ** 2)

    from open_flamingo_tpu.ops.layer_norm import _reference_ln

    def loss_r(x, s, b):
        return jnp.sum(_reference_ln(x, s, b, 1e-5) ** 2)

    import functools
    with jax.disable_jit():
        pass
    from open_flamingo_tpu.ops import layer_norm as lnmod

    lnmod.INTERPRET = True
    try:
        g1 = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    finally:
        lnmod.INTERPRET = False
    g2 = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(a, b2, atol=3e-5)


def test_vit_with_kernels_matches_einsum(rng):
    """ViT forward with the Pallas LN + attention kernels (forced,
    interpret) must match the plain einsum/flax path."""
    from open_flamingo_tpu.models.vit import VisionConfig, VisionTransformer
    from open_flamingo_tpu.ops import layer_norm as lnmod
    from open_flamingo_tpu.ops import vit_attention as vamod

    cfg = VisionConfig(
        image_size=28, patch_size=7, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128,
    )
    m = VisionTransformer(cfg=cfg)
    x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(params, x)
    lnmod.FORCE = lnmod.INTERPRET = True
    vamod.FORCE = vamod.INTERPRET = True
    try:
        got = m.apply(params, x)
    finally:
        lnmod.FORCE = lnmod.INTERPRET = False
        vamod.FORCE = vamod.INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
