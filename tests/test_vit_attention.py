"""Batched whole-sequence ViT attention kernel parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.layers import attend, split_heads
from open_flamingo_tpu.ops.vit_attention import (
    _reference,
    flat_vit_attention,
    vit_attention,
)


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


@pytest.mark.parametrize("b,s_real,s_pad,h,dh", [
    (2, 17, 24, 4, 32),    # hpb spans full width (D=128)
    (2, 17, 24, 2, 64),    # D=128, two heads in one block
    (1, 13, 16, 4, 64),    # D=256 > 128 -> hpb=2, two column blocks
    (2, 16, 16, 1, 128),   # single head, no pad rows
])
def test_flat_vit_attention_matches_reference(rng, b, s_real, s_pad, h, dh):
    """The flat-layout absorbed-ViT glue: per-head parity on flat
    (B, S_pad, H*dh) buffers incl. pad-key masking and head isolation."""
    d = h * dh
    q = jnp.asarray(rng.normal(size=(b, s_pad, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s_pad, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s_pad, d)), jnp.float32)
    got = flat_vit_attention(
        q, k, v, dh**-0.5, heads=h, s_real=s_real, interpret=True
    )
    # reference: per-head attention over the REAL keys only
    def heads_view(x):
        return x[:, :s_real].reshape(b, s_real, h, dh)
    want = attend(
        heads_view(q * dh**-0.5), heads_view(k), heads_view(v)
    ).reshape(b, s_real, d)
    np.testing.assert_allclose(got[:, :s_real], want, atol=2e-5)
    # pad query rows must be FINITE (uniform attention, no NaN)
    assert np.isfinite(np.asarray(got)).all()


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
