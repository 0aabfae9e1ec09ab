"""Fused media-masked xattn kernel parity (interpret mode) against both
the einsum reference and the MaskedCrossAttention module path."""

import jax
import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.ops.masked_xattn import (
    masked_xattn,
    reference_masked_xattn,
)

BH, D, N_LAT, T_IMG, TQ = 4, 16, 8, 3, 16
S = N_LAT * T_IMG


def _inputs(rng):
    q = jnp.asarray(rng.normal(size=(BH, TQ, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, S, D)), jnp.float32)
    # text_time: zeros (before first image), then 1..3
    tt = np.zeros((BH, TQ), np.int32)
    tt[:, 4:8] = 1
    tt[:, 8:12] = 2
    tt[:, 12:] = 3
    return q, k, v, jnp.asarray(tt)


def test_kernel_matches_reference(rng):
    q, k, v, tt = _inputs(rng)
    want = np.asarray(
        reference_masked_xattn(q, k, v, tt, n_latents=N_LAT, scale=0.25)
    )
    got = np.asarray(
        masked_xattn(q, k, v, tt, N_LAT, 0.25, 8, 8, True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    # text before any image -> exact zeros
    np.testing.assert_array_equal(got[:, :4], 0.0)


def test_kernel_gradients(rng):
    q, k, v, tt = _inputs(rng)

    def lf(q, k, v):
        return jnp.sum(masked_xattn(q, k, v, tt, N_LAT, 0.25, 8, 8, True) ** 2)

    def lr(q, k, v):
        return jnp.sum(
            reference_masked_xattn(q, k, v, tt, n_latents=N_LAT, scale=0.25) ** 2
        )

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_reference_matches_module_semantics(rng):
    """The kernel's einsum reference equals the module's einsum path
    (attend + post-softmax zeroing) in immediate mode."""
    from open_flamingo_tpu.models.layers import attend

    q, k, v, tt = _inputs(rng)
    media_time = jnp.arange(S) // N_LAT + 1
    mask = (tt[:, :, None] == media_time[None, None, :])[:, None]
    # attend expects (B, T, H, D): use H=1
    out_mod = attend(
        q[:, :, None, :] * 0.25,
        k[:, :, None, :],
        v[:, :, None, :],
        mask=mask,
        zero_rows=(tt == 0)[:, None, :, None],
    )[:, :, 0]
    out_ref = reference_masked_xattn(q, k, v, tt, n_latents=N_LAT, scale=0.25)
    np.testing.assert_allclose(
        np.asarray(out_mod), np.asarray(out_ref), atol=2e-5
    )
