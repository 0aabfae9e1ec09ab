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


def test_training_step_routes_xattn_through_pallas_kernel(rng, monkeypatch):
    """VERDICT r4 #9: the DEFAULT training step must engage the fused
    masked-xattn kernel (and therefore its Pallas custom-vjp backward)
    — not the einsum fallback — whenever the gate conditions hold.
    (a) the gate is TPU + multi-token + immediate; (b) with the gate
    forced on (interpret), a full training-loss grad through
    FlamingoLM calls masked_xattn."""
    import jax
    import jax.numpy as jnp

    import open_flamingo_tpu.models.xattn as xattn_mod
    import open_flamingo_tpu.ops.masked_xattn as mx

    # (a) gate semantics
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert xattn_mod.use_xattn_kernel(32, True)       # training shapes
    assert not xattn_mod.use_xattn_kernel(1, True)    # decode -> fused path
    assert not xattn_mod.use_xattn_kernel(32, False)  # ge-mode -> einsum
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert not xattn_mod.use_xattn_kernel(32, True)

    # (b) engagement through the real training objective
    calls = []
    real = mx.masked_xattn

    def spy(q, k, v, tt, n_latents, scale=1.0, block_q=128, block_k=128,
            interpret=False):
        calls.append(q.shape)
        return real(q, k, v, tt, n_latents, scale, 8, 8, True)

    monkeypatch.setattr(mx, "masked_xattn", spy)
    monkeypatch.setattr(
        xattn_mod, "use_xattn_kernel", lambda tq, imm: imm and tq >= 8
    )

    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig

    VOCAB, MEDIA, EOC = 64, 3, 4
    cfg = FlamingoConfig(
        vision=VisionConfig(
            image_size=14, patch_size=7, hidden_size=16, num_layers=1,
            num_heads=2, intermediate_size=32,
        ),
        lm=DecoderConfig(
            family="mpt", vocab_size=VOCAB, hidden_size=16, num_layers=1,
            num_heads=2, intermediate_size=32, alibi=True,
            attention_bias=False, ln_no_bias=True,
        ),
        media_token_id=MEDIA, eoc_token_id=EOC, cross_attn_every_n=1,
        num_vis_latents=4, perceiver_depth=1, perceiver_heads=2,
        perceiver_dim_head=8,
    )
    model = Flamingo(cfg=cfg)
    b, t = 2, 8
    vx = jnp.asarray(rng.normal(size=(b, 1, 1, 14, 14, 3)), jnp.float32)
    ids = rng.integers(7, VOCAB, size=(b, t))
    ids[:, 0] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vx, ids, mask)

    def loss(p):
        logits, _, _ = model.apply(p, vx, ids, mask)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert calls, "training grad never reached the masked-xattn kernel"
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
