"""Whole-layer decode kernel parity vs the two-launch composition
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import alibi_slopes
from open_flamingo_tpu.ops.decode_layer import attn_block_decode
from open_flamingo_tpu.ops.dense_stream import fused_mlp
from open_flamingo_tpu.ops.fused_layer import fused_layer_decode

B, D, H, DH, S, K2 = 4, 64, 4, 16, 32, 128


def _mk(rng, shape, scale=0.1):
    return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)


def _two_launch(x, ln1s, ln1b, wq, wout, kc, vc, mask, w1, w2, ln2s,
                ln2b, **kw):
    x2, kn, vn = attn_block_decode(
        x, ln1s, ln1b, wq, wout, kc, vc, mask,
        heads=H, head_dim=DH, scale=DH**-0.5,
        fused_qkv=True, slot=kw["slot"], slopes=kw.get("slopes"),
        clip=kw.get("clip"), eps=1e-5,
        wq_scale=kw.get("wq_scale"), wout_scale=kw.get("wout_scale"),
        layer_idx=kw.get("layer_idx"), interpret=True,
    )
    y = fused_mlp(
        x2, w1, w2, ln_scale=ln2s, ln_bias=ln2b, eps=1e-5,
        act="gelu", residual=x2,
        w1_scale=kw.get("w1_scale"), w2_scale=kw.get("w2_scale"),
        layer_idx=kw.get("layer_idx"), interpret=True,
    )
    return y, kn, vn


@pytest.mark.parametrize("alibi,clip", [(True, 6.0), (False, None)])
def test_fused_layer_mpt_matches_two_launch(rng, alibi, clip):
    x = _mk(rng, (B, D), 1.0)
    ln1s, ln1b = _mk(rng, (D,), 1.0) + 1, _mk(rng, (D,))
    ln2s, ln2b = _mk(rng, (D,), 1.0) + 1, _mk(rng, (D,))
    wq = _mk(rng, (D, 3 * D))
    wout = _mk(rng, (D, D))
    w1, w2 = _mk(rng, (D, K2)), _mk(rng, (K2, D))
    kc, vc = _mk(rng, (B, H, S, DH), 1.0), _mk(rng, (B, H, S, DH), 1.0)
    mask = jnp.ones((B, S), jnp.int32)
    slopes = alibi_slopes(H) if alibi else None
    kw = dict(slot=jnp.int32(5), slopes=slopes, clip=clip)

    want, kw_, vw_ = _two_launch(
        x, ln1s, ln1b, wq, wout, kc, vc, mask, w1, w2, ln2s, ln2b, **kw
    )
    got, kg, vg = fused_layer_decode(
        x, ln1s, ln1b, wq, wout, kc, vc, mask, w1, w2, ln2s, ln2b,
        heads=H, head_dim=DH, scale=DH**-0.5, act="gelu",
        fused_qkv=True, slot=jnp.int32(5), slopes=slopes, clip=clip,
        eps=1e-5, block_k2=64, interpret=True,
    )
    np.testing.assert_allclose(got, want, atol=3e-5)
    np.testing.assert_allclose(kg, kw_, atol=1e-6)
    np.testing.assert_allclose(vg, vw_, atol=1e-6)


def test_fused_layer_xattn_gated(rng):
    """xattn shape: static media K/V (no cache write), tanh gates on
    both halves, no LN biases on... (xattn has biases; use them)."""
    x = _mk(rng, (B, D), 1.0)
    ln1s, ln1b = _mk(rng, (D,), 1.0) + 1, _mk(rng, (D,))
    ln2s, ln2b = _mk(rng, (D,), 1.0) + 1, _mk(rng, (D,))
    inner = H * DH
    wq = _mk(rng, (D, inner))
    wout = _mk(rng, (inner, D))
    w1, w2 = _mk(rng, (D, K2)), _mk(rng, (K2, D))
    kc, vc = _mk(rng, (B, H, S, DH), 1.0), _mk(rng, (B, H, S, DH), 1.0)
    mask = np.ones((B, S), np.int32)
    mask[0] = 0      # all-masked row -> exact zero attn (media rule)
    mask = jnp.asarray(mask)
    g1, g2 = jnp.asarray([0.7]), jnp.asarray([-0.3])

    y1 = attn_block_decode(
        x, ln1s, ln1b, wq, wout, kc, vc, mask,
        heads=H, head_dim=DH, scale=DH**-0.5, gate=g1, eps=1e-5,
        interpret=True,
    )
    want = fused_mlp(
        y1, w1, w2, ln_scale=ln2s, ln_bias=ln2b, eps=1e-5, act="gelu",
        residual=y1, gate=g2, interpret=True,
    )
    got = fused_layer_decode(
        x, ln1s, ln1b, wq, wout, kc, vc, mask, w1, w2, ln2s, ln2b,
        heads=H, head_dim=DH, scale=DH**-0.5, act="gelu",
        gate=g1, gate2=g2, eps=1e-5, block_k2=64, interpret=True,
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_layer_int8_stacked(rng):
    """int8 weights + stacked layer operands + stacked caches."""
    L = 3
    x = _mk(rng, (B, D), 1.0)
    ln1s = _mk(rng, (L, D), 1.0) + 1
    ln2s = _mk(rng, (L, D), 1.0) + 1
    wq_q = rng.integers(-127, 128, size=(L, D, 3 * D)).astype(np.float32)
    sq = 2.0 ** rng.integers(-12, -8, size=(L, 3 * D)).astype(np.float32)
    wo_q = rng.integers(-127, 128, size=(L, D, D)).astype(np.float32)
    so = 2.0 ** rng.integers(-12, -8, size=(L, D)).astype(np.float32)
    w1_q = rng.integers(-127, 128, size=(L, D, K2)).astype(np.float32)
    s1 = 2.0 ** rng.integers(-12, -8, size=(L, K2)).astype(np.float32)
    w2_q = rng.integers(-127, 128, size=(L, K2, D)).astype(np.float32)
    s2 = 2.0 ** rng.integers(-12, -8, size=(L, D)).astype(np.float32)
    kc = _mk(rng, (L, B, H, S, DH), 1.0)
    vc = _mk(rng, (L, B, H, S, DH), 1.0)
    mask = jnp.ones((B, S), jnp.int32)

    for li in range(L):
        got, kg, vg = fused_layer_decode(
            x, ln1s, None,
            jnp.asarray(wq_q, jnp.int8), jnp.asarray(wo_q, jnp.int8),
            kc, vc, mask,
            jnp.asarray(w1_q, jnp.int8), jnp.asarray(w2_q, jnp.int8),
            ln2s, None,
            heads=H, head_dim=DH, scale=DH**-0.5, act="gelu",
            fused_qkv=True, slot=jnp.int32(7),
            wq_scale=jnp.asarray(sq), wout_scale=jnp.asarray(so),
            w1_scale=jnp.asarray(s1), w2_scale=jnp.asarray(s2),
            layer_idx=li, eps=1e-5, block_k2=64, interpret=True,
        )
        want, kw_, vw_ = _two_launch(
            x, ln1s[li], None,
            jnp.asarray(wq_q[li] * sq[li][None, :], jnp.float32),
            jnp.asarray(wo_q[li] * so[li][None, :], jnp.float32),
            kc[li], vc[li], mask,
            jnp.asarray(w1_q[li] * s1[li][None, :], jnp.float32),
            jnp.asarray(w2_q[li] * s2[li][None, :], jnp.float32),
            ln2s[li], None,
            slot=jnp.int32(7),
        )
        np.testing.assert_allclose(got, want, rtol=4e-4, atol=4e-4)
        np.testing.assert_allclose(kg[li], kw_, atol=2e-4)
        np.testing.assert_allclose(vg[li], vw_, atol=2e-4)


def test_xattn_only_merge_token_equality(rng):
    """XATTN_ONLY (round 5): gated-xattn runs the single-launch fused
    layer while decoder blocks stay two-launch — token equality on a
    tiny random scan model (VERDICT r4 #7 merge study)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_flamingo_tpu.generation import (
        GenerationConfig,
        flamingo_generate,
    )
    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig
    from open_flamingo_tpu.ops import dense_stream, fused_layer

    VOCAB, MEDIA, EOC = 128, 3, 4
    vis = VisionConfig(
        image_size=14, patch_size=7, hidden_size=24, num_layers=1,
        num_heads=2, intermediate_size=32,
    )
    lm = DecoderConfig(
        family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=64, alibi=True,
        attention_bias=False, ln_no_bias=True,
    )
    cfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=8, scan_layers=True,
    )
    model = Flamingo(cfg=cfg)
    b, t = 2, 6
    vision_x = jnp.asarray(rng.normal(size=(b, 1, 1, 14, 14, 3)), jnp.float32)
    ids = rng.integers(7, VOCAB, size=(b, t))
    ids[:, 0] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    fused_layer.INTERPRET = True
    try:
        base = flamingo_generate(model, params, vision_x, ids, mask, gen_cfg)
        fused_layer.XATTN_ONLY = True
        merged = flamingo_generate(
            model, params, vision_x, ids, mask, gen_cfg
        )
    finally:
        fused_layer.XATTN_ONLY = False
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
        fused_layer.INTERPRET = False
    np.testing.assert_array_equal(np.asarray(base), np.asarray(merged))
