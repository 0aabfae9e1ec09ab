"""Batched whole-sequence ViT attention kernel parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.layers import attend, split_heads
from open_flamingo_tpu.ops.vit_attention import vit_attention, _reference


@pytest.mark.parametrize("bh,s,d,blk", [
    (8, 27, 16, 4),    # ragged S (ViT's 257-style)
    (4, 24, 16, 8),    # block_bh > bh -> halved internally
    (16, 16, 32, 8),
])
def test_vit_attention_matches_reference(rng, bh, s, d, blk):
    q = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    got = vit_attention(q, k, v, d**-0.5, blk, True)
    want = _reference(q, k, v, d**-0.5)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vit_attention_matches_attend(rng):
    """Same semantics as the einsum `attend` helper used by the ViT."""
    b, s, h, dh = 2, 27, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, dh)), jnp.float32)
    want = attend(q * dh**-0.5, k, v)          # (b, s, h, dh)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, dh)
    got = vit_attention(qf, kf, vf, dh**-0.5, 4, True)
    got = got.reshape(b, h, s, dh).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vit_attention_grad_matches_einsum(rng):
    bh, s, d = 4, 12, 8
    q = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(vit_attention(q, k, v, 0.5, 4, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, 0.5) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=3e-5)
