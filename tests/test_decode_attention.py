"""Fused decode-attention kernel parity vs the einsum reference
(interpret mode on CPU): padding, ALiBi, all-masked rows, block split."""

import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import alibi_slopes
from open_flamingo_tpu.ops.decode_attention import (
    decode_attention,
    reference_decode_attention,
)

B, H, S, D = 3, 4, 24, 16


def _inputs(rng, mask=None):
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    if mask is None:
        mask = np.ones((B, S), np.int32)
    return q, k, v, jnp.asarray(mask, jnp.int32)


@pytest.mark.parametrize("block_k", [8, 24])
def test_decode_matches_reference(rng, block_k):
    mask = np.ones((B, S), np.int32)
    mask[0, :5] = 0      # left padding
    mask[:, 20:] = 0     # unwritten cache slots
    q, k, v, m = _inputs(rng, mask)
    want = reference_decode_attention(q, k, v, m, scale=0.25)
    got = decode_attention(
        q, k, v, m, scale=0.25, block_k=block_k, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_decode_alibi(rng):
    q, k, v, m = _inputs(rng)
    slopes = alibi_slopes(H)
    want = reference_decode_attention(q, k, v, m, scale=0.5, slopes=slopes)
    got = decode_attention(
        q, k, v, m, scale=0.5, slopes=slopes, block_k=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_decode_all_masked_rows_zero(rng):
    """A sequence with an all-zero mask (xattn: text before the first
    image) must produce exact zeros."""
    mask = np.ones((B, S), np.int32)
    mask[1] = 0
    q, k, v, m = _inputs(rng, mask)
    got = np.asarray(decode_attention(q, k, v, m, interpret=True))
    np.testing.assert_array_equal(got[1], 0.0)
    want = np.asarray(reference_decode_attention(q, k, v, m))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("block_k", [16, 9])
def test_decode_ragged_s_blocks(rng, block_k):
    # S % block_k != 0: the last grid block overhangs the cache; the
    # in-kernel bound must keep out-of-bounds keys masked even if the
    # OOB mask bytes read as valid (ADVICE r2: silent wrong logits).
    q, k, v, mask = _inputs(rng)
    got = decode_attention(q, k, v, mask, scale=0.5, block_k=block_k,
                           interpret=True)
    want = reference_decode_attention(q, k, v, mask, scale=0.5)
    np.testing.assert_allclose(got, want, atol=1e-5)
