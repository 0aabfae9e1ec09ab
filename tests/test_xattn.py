"""Truth-table tests for the media-time masking semantics — the most
bug-prone logic in the capability surface (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.xattn import (
    GatedCrossAttentionBlock,
    MaskedCrossAttention,
    cached_media_text_time,
    media_time_from_locations,
)

B, T_TXT, T_IMG, N_LAT, D_TXT, D_VIS = 2, 10, 3, 4, 16, 12


def make_inputs(rng, t_txt=T_TXT):
    x = jnp.asarray(rng.normal(size=(B, t_txt, D_TXT)), jnp.float32)
    media = jnp.asarray(rng.normal(size=(B, T_IMG, N_LAT, D_VIS)), jnp.float32)
    # media tokens at positions 1, 4, 7 in every row
    media_locations = jnp.zeros((B, t_txt), bool).at[:, [1, 4, 7]].set(True)
    return x, media, media_locations


def test_media_time_from_locations():
    locs = jnp.array([[False, True, False, True, False]])
    tt = media_time_from_locations(locs)
    np.testing.assert_array_equal(np.asarray(tt), [[0, 1, 1, 2, 2]])


def test_gate_zero_identity(rng):
    """At init the gated block must be the identity (gates tanh(0)=0)."""
    x, media, locs = make_inputs(rng)
    blk = GatedCrossAttentionBlock(dim=D_TXT, dim_visual=D_VIS)
    tt = media_time_from_locations(locs)
    params = blk.init(jax.random.PRNGKey(0), x, media, tt)
    out = blk.apply(params, x, media, tt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("immediate", [True, False])
def test_masking_truth_table(rng, immediate):
    """Perturbing image j may only change text positions allowed to see it:
    text_time == j+1 (immediate) or text_time >= j+1 (all-previous)."""
    x, media, locs = make_inputs(rng)
    tt = media_time_from_locations(locs)
    mod = MaskedCrossAttention(
        dim=D_TXT, dim_visual=D_VIS, only_attend_immediate_media=immediate
    )
    params = mod.init(jax.random.PRNGKey(1), x, media, tt)
    base = np.asarray(mod.apply(params, x, media, tt))

    tt_np = np.asarray(tt)
    for j in range(T_IMG):
        media_j = media.at[:, j].add(
            jnp.asarray(rng.normal(size=(B, N_LAT, D_VIS)), jnp.float32)
        )
        out = np.asarray(mod.apply(params, x, media_j, tt))
        changed = np.any(np.abs(out - base) > 1e-7, axis=-1)  # (B, T_txt)
        if immediate:
            allowed = tt_np == j + 1
        else:
            # In "ge" mode, rows with text_time == 0 are fully masked; the
            # reference's masked_fill+softmax makes them uniform over all
            # K/V (helpers.py:218-221), so they see every image. Same here.
            allowed = (tt_np >= j + 1) | (tt_np == 0)
        # no change outside allowed positions
        assert not np.any(changed & ~allowed), f"leak from image {j}"
        # and the allowed positions do change (non-degenerate test)
        assert np.all(changed[allowed]), f"image {j} ignored"


def test_text_before_first_image_is_zero(rng):
    """Immediate mode: positions with text_time == 0 output exactly 0
    (reference zeroes attention after softmax, helpers.py:223-229)."""
    x, media, locs = make_inputs(rng)
    tt = media_time_from_locations(locs)
    mod = MaskedCrossAttention(dim=D_TXT, dim_visual=D_VIS)
    params = mod.init(jax.random.PRNGKey(2), x, media, tt)
    out = np.asarray(mod.apply(params, x, media, tt))
    zero_pos = np.asarray(tt) == 0
    assert zero_pos.any()
    np.testing.assert_allclose(out[zero_pos], 0.0, atol=1e-7)


def test_cached_media_decode_equivalence(rng):
    """A decode step with cached media (text_time = total media count) must
    match the corresponding position of a full forward when that position
    follows the last image."""
    x, media, locs = make_inputs(rng)
    tt_full = media_time_from_locations(locs)
    mod = MaskedCrossAttention(dim=D_TXT, dim_visual=D_VIS)
    params = mod.init(jax.random.PRNGKey(3), x, media, tt_full)
    full = np.asarray(mod.apply(params, x, media, tt_full))

    # decode step: only the last token, with cached-media text time
    x_step = x[:, -1:]
    tt_step = cached_media_text_time(locs, 1)
    np.testing.assert_array_equal(np.asarray(tt_step), [[3]] * B)
    step = np.asarray(mod.apply(params, x_step, media, tt_step))
    np.testing.assert_allclose(step[:, 0], full[:, -1], atol=1e-5)
