"""Parity tests for the fused streaming dense/MLP decode kernels
(interpret mode on CPU; the TPU path is exercised by bench.py and the
generate parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.ops.dense_stream import (
    fused_dense,
    fused_mlp,
    reference_dense,
    reference_mlp,
)

B, K, N, K2 = 8, 256, 384, 512


@pytest.fixture
def data(rng):
    def t(*shape, scale=0.5):
        return jnp.asarray(rng.normal(size=shape) * scale, jnp.float32)

    return t


def test_fused_dense_plain(data):
    x, w = data(B, K), data(K, N, scale=0.05)
    got = fused_dense(x, w, block_n=128, interpret=True)
    want = reference_dense(x, w)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_dense_full_epilogue(data):
    x, w = data(B, K), data(K, N, scale=0.05)
    ln_s, ln_b = data(K, scale=1.0), data(K, scale=0.1)
    bias, res = data(N, scale=0.1), data(B, N)
    for act in (None, "gelu", "silu"):
        got = fused_dense(
            x, w, bias=bias, ln_scale=ln_s, ln_bias=ln_b, act=act,
            clip=3.0, residual=res, gate=jnp.asarray([0.7]),
            block_n=192, interpret=True,
        )
        want = reference_dense(
            x, w, bias=bias, ln_scale=ln_s, ln_bias=ln_b, act=act,
            clip=3.0, residual=res, gate=jnp.asarray([0.7]),
        )
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(act))


def test_fused_dense_ln_no_bias(data):
    # MPT-style LN without bias (ln_no_bias)
    x, w = data(B, K), data(K, N, scale=0.05)
    ln_s = data(K, scale=1.0)
    got = fused_dense(x, w, ln_scale=ln_s, clip=6.0, block_n=N,
                      interpret=True)
    want = reference_dense(x, w, ln_scale=ln_s, clip=6.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_mlp(data):
    x = data(B, K)
    w1, w2 = data(K, K2, scale=0.05), data(K2, N, scale=0.05)
    ln_s = data(K, scale=1.0)
    res = data(B, N)
    got = fused_mlp(
        x, w1, w2, ln_scale=ln_s, act="gelu", residual=res,
        block_k2=128, interpret=True,
    )
    want = reference_mlp(x, w1, w2, ln_scale=ln_s, act="gelu", residual=res)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_mlp_biases_gate(data):
    x = data(B, K)
    w1, w2 = data(K, K2, scale=0.05), data(K2, N, scale=0.05)
    b1, b2 = data(K2, scale=0.1), data(N, scale=0.1)
    ln_s, ln_b = data(K, scale=1.0), data(K, scale=0.1)
    res = data(B, N)
    got = fused_mlp(
        x, w1, w2, b1=b1, b2=b2, ln_scale=ln_s, ln_bias=ln_b, act="gelu",
        residual=res, gate=jnp.asarray([-0.3]), block_k2=256,
        interpret=True,
    )
    want = reference_mlp(
        x, w1, w2, b1=b1, b2=b2, ln_scale=ln_s, ln_bias=ln_b, act="gelu",
        residual=res, gate=jnp.asarray([-0.3]),
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_mlp_side_stream(data):
    """Side-stream tile: an unrelated matmul rides the MLP launch —
    main output unchanged, side output = act(LN(side_x)) @ side_w
    (+ side_residual), M-partitioned over the K2 grid."""
    x = data(B, K)
    w1, w2 = data(K, K2, scale=0.05), data(K2, N, scale=0.05)
    ln_s = data(K, scale=1.0)
    res = data(B, N)
    sm, sk, sn = 32, 128, 192      # K2/block 512/128 = 4 grid steps
    sx, sw = data(sm, sk), data(sk, sn, scale=0.05)
    sls, slb = data(sk, scale=1.0), data(sk, scale=0.1)
    sres = data(sm, sn)
    want_main = reference_mlp(
        x, w1, w2, ln_scale=ln_s, act="gelu", residual=res
    )
    sb = data(sn, scale=0.1)
    for side_ln, side_act, side_bias, side_res in [
        (None, None, None, None),
        ((sls, slb), None, None, None),
        ((sls, None), "gelu", sb, sres),
        (None, "quick_gelu", sb, None),
    ]:
        got_main, got_side = fused_mlp(
            x, w1, w2, ln_scale=ln_s, act="gelu", residual=res,
            block_k2=128, interpret=True,
            side_x=sx, side_w=sw, side_ln=side_ln, side_act=side_act,
            side_b=side_bias, side_residual=side_res,
        )
        np.testing.assert_allclose(got_main, want_main, atol=3e-5)
        sh = np.asarray(sx, np.float64)
        if side_ln is not None:
            mu = sh.mean(-1, keepdims=True)
            var = sh.var(-1, keepdims=True)
            sh = (sh - mu) / np.sqrt(var + 1e-5) * np.asarray(sls)
            if side_ln[1] is not None:
                sh = sh + np.asarray(slb)
        if side_act == "gelu":
            from scipy.special import erf

            sh = 0.5 * sh * (1.0 + erf(sh / np.sqrt(2.0)))
        elif side_act == "quick_gelu":
            sh = sh / (1.0 + np.exp(-1.702 * sh))
        want_side = sh @ np.asarray(sw, np.float64)
        if side_bias is not None:
            want_side = want_side + np.asarray(sb, np.float64)
        if side_res is not None:
            want_side = want_side + np.asarray(sres, np.float64)
        np.testing.assert_allclose(got_side, want_side, atol=3e-4)


def test_fused_mlp_side_stream_stacked(data):
    """Side stream composes with the stacked-weight (scan decode)
    layout: main weights carry the layer axis, side operands do not."""
    L = 3
    x = data(B, K)
    w1 = data(L, K, K2, scale=0.05)
    w2 = data(L, K2, N, scale=0.05)
    ln_s = data(L, K, scale=1.0)
    sm, sk, sn = 16, 128, 64
    sx, sw = data(sm, sk), data(sk, sn, scale=0.05)
    for li in range(L):
        got_main, got_side = fused_mlp(
            x, w1, w2, ln_scale=ln_s, act="gelu",
            layer_idx=li, block_k2=128, interpret=True,
            side_x=sx, side_w=sw,
        )
        want_main = reference_mlp(
            x, w1[li], w2[li], ln_scale=ln_s[li], act="gelu"
        )
        want_side = np.asarray(sx, np.float64) @ np.asarray(sw, np.float64)
        np.testing.assert_allclose(got_main, want_main, atol=3e-5)
        np.testing.assert_allclose(got_side, want_side, atol=3e-4)


def test_mpt_block_fused_decode_matches_standard(rng):
    """One decode step through MPTBlock: the fused-kernel path (forced,
    interpret mode) must match the standard einsum path."""
    from open_flamingo_tpu.models.decoders.common import (
        DecoderConfig,
        KVCache,
        make_attn_inputs,
    )
    from open_flamingo_tpu.models.decoders.mpt import MPTBlock
    from open_flamingo_tpu.ops import dense_stream

    cfg = DecoderConfig(
        family="mpt", vocab_size=64, hidden_size=128, num_layers=1,
        num_heads=2, intermediate_size=256, alibi=True, ln_no_bias=True,
        clip_qkv=6.0, attention_bias=False,
    )
    block = MPTBlock(cfg=cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    B, T = 2, 4
    x = jnp.asarray(rng.normal(size=(B, T, 128)), jnp.float32)
    cache = KVCache.create(cfg, B, max_length=8)
    am = jnp.ones((B, T), jnp.int32)
    attn, cache = make_attn_inputs(am, cache=cache)
    params = block.init(jax.random.PRNGKey(0), x, attn, cache.layers[0])

    # prefill
    _, kv = block.apply(params, x, attn, cache.layers[0])
    cache = cache.replace(layers=(kv,), index=cache.index + T)

    # one decode token, both paths
    xt = jnp.asarray(rng.normal(size=(B, 1, 128)), jnp.float32)
    am1 = jnp.ones((B, 1), jnp.int32)
    attn1, cache1 = make_attn_inputs(am1, cache=cache)

    y_std, kv_std = block.apply(params, xt, attn1, cache1.layers[0])

    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        y_fused, kv_fused = block.apply(params, xt, attn1, cache1.layers[0])
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False

    np.testing.assert_allclose(y_fused, y_std, atol=2e-5)
    np.testing.assert_allclose(kv_fused.k, kv_std.k, atol=2e-5)
    np.testing.assert_allclose(kv_fused.v, kv_std.v, atol=2e-5)


def test_gated_xattn_fused_decode_matches_standard(rng):
    """One decode step through GatedCrossAttentionBlock with cached media
    K/V: fused path (forced, interpret) == standard path, including the
    no-preceding-image zero rows and the tanh gates."""
    from open_flamingo_tpu.models.xattn import GatedCrossAttentionBlock
    from open_flamingo_tpu.ops import dense_stream

    D, DV, HEADS, DH = 128, 96, 2, 64
    block = GatedCrossAttentionBlock(
        dim=D, dim_visual=DV, dim_head=DH, heads=HEADS,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    B, T_IMG, N_LAT = 2, 2, 8
    x = jnp.asarray(rng.normal(size=(B, 1, D)), jnp.float32)
    media = jnp.asarray(rng.normal(size=(B, T_IMG, N_LAT, DV)), jnp.float32)
    # row 0 has seen 1 image; row 1 none (zero-row rule)
    text_time = jnp.asarray([[1], [0]], jnp.int32)
    params = block.init(jax.random.PRNGKey(0), x, media, text_time)
    # gates init to zero -> make them nonzero so gating is exercised
    params = jax.tree.map(
        lambda a: jnp.full_like(a, 0.4) if a.shape == (1,) else a, params
    )

    # capture media_kv like generate() does at prefill
    _, state = block.apply(
        x=x, media=media, text_time=text_time,
        variables=params, mutable=["media_kv"],
    )
    media_kv = jax.tree.leaves(state["media_kv"])
    media_kv = (media_kv[0], media_kv[1])

    y_std = block.apply(params, x, media, text_time, media_kv=media_kv)

    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        y_fused = block.apply(params, x, media, text_time, media_kv=media_kv)
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False

    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_std),
                               atol=2e-5)


@pytest.mark.parametrize("family", ["mpt", "gptneox", "llama", "gptj", "opt"])
def test_generate_fused_decode_matches_standard(rng, family):
    """Greedy generate on a tiny Flamingo: the fully-fused decode path
    (blocks + xattn + final-LN/logits kernels, forced + interpret) must
    produce identical tokens to the standard path."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig
    from open_flamingo_tpu.ops import dense_stream

    VOCAB, MEDIA, EOC = 128, 3, 4
    vis = VisionConfig(
        image_size=14, patch_size=7, hidden_size=24, num_layers=1,
        num_heads=2, intermediate_size=32,
    )
    lm = {
        "mpt": DecoderConfig(
            family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, alibi=True,
            attention_bias=False, ln_no_bias=True, clip_qkv=6.0,
        ),
        "gptneox": DecoderConfig(
            family="gptneox", vocab_size=VOCAB, hidden_size=32,
            num_layers=2, num_heads=4, intermediate_size=64,
            rotary_pct=0.25, tie_word_embeddings=False,
        ),
        "llama": DecoderConfig(
            family="llama", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, attention_bias=False,
            tie_word_embeddings=False, hidden_act="silu",
            use_parallel_residual=False,
        ),
        "gptj": DecoderConfig(
            family="gptj", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, rotary_dim=4,
            tie_word_embeddings=False, lm_head_bias=True,
        ),
        "opt": DecoderConfig(
            family="opt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64,
        ),
    }[family]
    cfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=8,
    )
    model = Flamingo(cfg=cfg)
    B, T = 2, 6
    vision_x = jnp.asarray(rng.normal(size=(B, 1, 1, 14, 14, 3)), jnp.float32)
    ids = rng.integers(7, VOCAB, size=(B, T))
    ids[:, 0] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)

    out_std = flamingo_generate(model, params, vision_x, ids, mask, gen_cfg)

    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        out_fused = flamingo_generate(
            model, params, vision_x, ids, mask, gen_cfg
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False

    np.testing.assert_array_equal(np.asarray(out_std), np.asarray(out_fused))


def test_attend_out_decode_parity(rng):
    """Merged attend+out kernel vs the einsum reference: with and
    without cache write, alibi, gate, residual, all-masked rows."""
    from open_flamingo_tpu.ops.decode_layer import (
        attend_out_decode,
        reference_attend_out,
    )

    Bq, H, DH, S, D = 3, 4, 64, 32, 96
    t = lambda *s, scale=0.5: jnp.asarray(rng.normal(size=s) * scale,
                                          jnp.float32)
    q = t(Bq, H, DH)
    kc, vc = t(Bq, H, S, DH), t(Bq, H, S, DH)
    wout = t(H, DH, D, scale=0.1)
    mask = jnp.asarray(rng.integers(0, 2, size=(Bq, S)), jnp.int32)
    mask = mask.at[2].set(0)  # an all-masked row -> exact zeros
    res = t(Bq, D)
    slopes = np.asarray([0.5 ** (i + 1) for i in range(H)], np.float32)

    # static attend (media): gate + residual + all-masked row
    got = attend_out_decode(
        q, kc, vc, mask, wout, scale=0.3, gate=jnp.asarray([0.7]),
        residual=res, interpret=True,
    )
    want = reference_attend_out(
        q, kc, vc, mask, wout, scale=0.3, gate=jnp.asarray([0.7]),
        residual=res,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # update attend (self-attn): cache write + alibi + residual
    kn, vn = t(Bq, H, DH), t(Bq, H, DH)
    mask2 = jnp.ones((Bq, S), jnp.int32)
    slot = jnp.asarray(7, jnp.int32)
    got = attend_out_decode(
        q, kc, vc, mask2, wout, scale=0.3, k_new=kn, v_new=vn, slot=slot,
        slopes=slopes, residual=res, block_s=8, interpret=True,
    )
    want = reference_attend_out(
        q, kc, vc, mask2, wout, scale=0.3, k_new=kn, v_new=vn, slot=7,
        slopes=slopes, residual=res,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5)


def test_attn_block_decode_parity(rng):
    """Single-launch attention half (QKV in-kernel) vs composing the
    reference pieces: LN -> clip(qkv) -> write+attend+out."""
    from open_flamingo_tpu.ops.decode_layer import (
        attn_block_decode,
        reference_attend_out,
    )
    from open_flamingo_tpu.ops.dense_stream import reference_dense

    Bq, H, DH, S = 3, 4, 64, 32
    D = H * DH
    t = lambda *s, scale=0.5: jnp.asarray(rng.normal(size=s) * scale,
                                          jnp.float32)
    x = t(Bq, D)
    ln_s, ln_b = t(D, scale=1.0), t(D, scale=0.1)
    wqkv = t(D, 3 * D, scale=0.05)
    wout = t(D, D, scale=0.05)
    kc, vc = t(Bq, H, S, DH), t(Bq, H, S, DH)
    mask = jnp.ones((Bq, S), jnp.int32)
    slopes = np.asarray([0.5 ** (i + 1) for i in range(H)], np.float32)
    slot = 5

    got_y, got_k, got_v = attn_block_decode(
        x, ln_s, ln_b, wqkv, wout, kc, vc, mask,
        heads=H, head_dim=DH, scale=0.3, fused_qkv=True, slot=slot,
        slopes=slopes, clip=4.0, head_block=2, block_s=8, interpret=True,
    )
    qkv = reference_dense(x, wqkv, ln_scale=ln_s, ln_bias=ln_b, clip=4.0)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want_y, want_k, want_v = reference_attend_out(
        q.reshape(Bq, H, DH), kc, vc, mask,
        wout.reshape(H, DH, D), scale=0.3,
        k_new=k.reshape(Bq, H, DH), v_new=v.reshape(Bq, H, DH), slot=slot,
        slopes=slopes, residual=x,
    )
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=2e-5)

    # static media variant: gate, all-masked row
    mask2 = jnp.asarray(rng.integers(0, 2, size=(Bq, S)), jnp.int32)
    mask2 = mask2.at[1].set(0)
    wq = t(D, D, scale=0.05)
    got = attn_block_decode(
        x, ln_s, ln_b, wq, wout, kc, vc, mask2,
        heads=H, head_dim=DH, scale=0.3, gate=jnp.asarray([0.6]),
        head_block=4, interpret=True,
    )
    q2 = reference_dense(x, wq, ln_scale=ln_s, ln_bias=ln_b)
    want = reference_attend_out(
        q2.reshape(Bq, H, DH), kc, vc, mask2, wout.reshape(H, DH, D),
        scale=0.3, gate=jnp.asarray([0.6]), residual=x,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_attn_block_decode_side_stream(rng):
    """Absorbed-ViT side tile on the ATTENTION-block launch (the
    round-5 extra carriers: attn launches stream the whole KV cache, so
    their DMA windows are the largest in a quantized decode loop). Main
    outputs identical to the no-side call; side output =
    LN(side_x) @ side_w (+bias/residual), M-partitioned over the
    head-group grid."""
    from open_flamingo_tpu.ops.decode_layer import attn_block_decode

    Bq, H, DH, S = 3, 4, 64, 32
    D = H * DH
    t = lambda *s, scale=0.5: jnp.asarray(rng.normal(size=s) * scale,
                                          jnp.float32)
    x = t(Bq, D)
    ln_s, ln_b = t(D, scale=1.0), t(D, scale=0.1)
    wqkv = t(D, 3 * D, scale=0.05)
    wout = t(D, D, scale=0.05)
    kc, vc = t(Bq, H, S, DH), t(Bq, H, S, DH)
    mask = jnp.ones((Bq, S), jnp.int32)
    sm, sk, sn = 16, 128, 192          # head_block 2 -> 2 grid steps
    sx, sw = t(sm, sk), t(sk, sn, scale=0.05)
    sls, slb = t(sk, scale=1.0), t(sk, scale=0.1)
    sb, sres = t(sn, scale=0.1), t(sm, sn)
    common = dict(
        heads=H, head_dim=DH, scale=0.3, fused_qkv=True, slot=5,
        clip=4.0, head_block=2, block_s=8, interpret=True,
    )
    base_y, base_k, base_v = attn_block_decode(
        x, ln_s, ln_b, wqkv, wout, kc, vc, mask, **common
    )
    got_y, got_k, got_v, got_side = attn_block_decode(
        x, ln_s, ln_b, wqkv, wout, kc, vc, mask, **common,
        side_x=sx, side_w=sw, side_ln=(sls, slb), side_b=sb,
        side_residual=sres,
    )
    np.testing.assert_array_equal(np.asarray(got_y), np.asarray(base_y))
    np.testing.assert_array_equal(np.asarray(got_k), np.asarray(base_k))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(base_v))
    sh = np.asarray(sx, np.float64)
    mu = sh.mean(-1, keepdims=True)
    var = sh.var(-1, keepdims=True)
    sh = (sh - mu) / np.sqrt(var + 1e-5) * np.asarray(sls) + np.asarray(slb)
    want_side = sh @ np.asarray(sw, np.float64) + np.asarray(sb) + np.asarray(
        sres, np.float64
    )
    np.testing.assert_allclose(got_side, want_side, atol=3e-4)

    # the static-media (xattn attend) variant: gate + no cache write
    wq = t(D, D, scale=0.05)
    base = attn_block_decode(
        x, ln_s, ln_b, wq, wout, kc, vc, mask,
        heads=H, head_dim=DH, scale=0.3, gate=jnp.asarray([0.6]),
        head_block=4, interpret=True,
    )
    got, got_side2 = attn_block_decode(
        x, ln_s, ln_b, wq, wout, kc, vc, mask,
        heads=H, head_dim=DH, scale=0.3, gate=jnp.asarray([0.6]),
        head_block=4, interpret=True,
        side_x=sx, side_w=sw, side_act="quick_gelu",
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))
    sh2 = np.asarray(sx, np.float64)
    sh2 = sh2 / (1.0 + np.exp(-1.702 * sh2))
    np.testing.assert_allclose(
        got_side2, sh2 @ np.asarray(sw, np.float64), atol=3e-4
    )


def test_fused_dense_ragged_vocab(data):
    """N not a multiple of the block (un-aligned vocab, e.g. 50434):
    last-block out-of-bounds columns must be masked, both layouts."""
    x = data(B, K)
    n = 390  # 3 x 128 + 6
    w = data(K, n, scale=0.05)
    got = fused_dense(x, w, block_n=128, interpret=True)
    np.testing.assert_allclose(got, reference_dense(x, w), atol=1e-5)
    wt = data(n, K, scale=0.05)
    got_t = fused_dense(x, wt, w_transposed=True, block_n=128,
                        interpret=True)
    np.testing.assert_allclose(got_t, reference_dense(x, wt.T), atol=1e-5)


def test_fused_dense_bf16(data):
    x = data(B, K).astype(jnp.bfloat16)
    w = data(K, N, scale=0.05).astype(jnp.bfloat16)
    got = fused_dense(x, w, block_n=128, interpret=True)
    want = reference_dense(x, w)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


@pytest.mark.parametrize("k2,block", [(352, 128), (384, 256), (96, 64)])
def test_fused_mlp_ragged_k2(data, k2, block):
    # intermediate_size not divisible by the block (llama-7B 11008,
    # OPT/pythia 3072 at block 2048 — ADVICE r2 high): the last hidden
    # block is lane-masked in-kernel instead of asserting.
    x = data(B, K)
    w1, w2 = data(K, k2, scale=0.05), data(k2, N, scale=0.05)
    b1, b2 = data(k2, scale=0.1), data(N, scale=0.1)
    ln_s = data(K, scale=1.0)
    res = data(B, N)
    got = fused_mlp(
        x, w1, w2, b1=b1, b2=b2, ln_scale=ln_s, act="gelu",
        residual=res, block_k2=block, interpret=True,
    )
    want = reference_mlp(
        x, w1, w2, b1=b1, b2=b2, ln_scale=ln_s, act="gelu", residual=res
    )
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_mlp_ragged_k2_swiglu(data):
    x = data(B, K)
    k2 = 352
    w1, w1g = data(K, k2, scale=0.05), data(K, k2, scale=0.05)
    w2 = data(k2, N, scale=0.05)
    got = fused_mlp(
        x, w1, w2, w1_gate=w1g, act="silu", block_k2=128, interpret=True,
    )
    want = reference_mlp(x, w1, w2, w1_gate=w1g, act="silu")
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_attend_out_decode_gqa(rng):
    """Grouped-query attend: query head hh reads kv head hh // n_rep
    straight from the grouped cache (no repeat_kv materialization)."""
    from open_flamingo_tpu.ops.decode_layer import (
        attend_out_decode,
        reference_attend_out,
    )

    b, h, h_kv, dh, d, s = 3, 8, 2, 16, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    kc = jnp.asarray(rng.normal(size=(b, h_kv, s, dh)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, h_kv, s, dh)), jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, h_kv, dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, h_kv, dh)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[:, 20:] = 0
    mask[:, 5] = 1
    mask = jnp.asarray(mask)
    wout = jnp.asarray(rng.normal(size=(h, dh, d)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    got, k2, v2 = attend_out_decode(
        q, kc, vc, mask, wout, scale=0.25, k_new=kn, v_new=vn, slot=5,
        residual=res, interpret=True,
    )
    want, kw, vw = reference_attend_out(
        q, kc, vc, mask, wout, scale=0.25, k_new=kn, v_new=vn, slot=5,
        residual=res,
    )
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(k2, kw, atol=1e-6)
    np.testing.assert_allclose(v2, vw, atol=1e-6)


def test_generate_fused_decode_llama_gqa(rng):
    """llama GQA (n_rep=2) now routes through the fused decode path:
    token equality vs the standard path."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig
    from open_flamingo_tpu.ops import dense_stream

    VOCAB, MEDIA, EOC = 128, 3, 4
    vis = VisionConfig(
        image_size=14, patch_size=7, hidden_size=24, num_layers=1,
        num_heads=2, intermediate_size=32,
    )
    lm = DecoderConfig(
        family="llama", vocab_size=VOCAB, hidden_size=32, num_layers=2,
        num_heads=4, num_kv_heads=2, intermediate_size=64,
        attention_bias=False, tie_word_embeddings=False,
        hidden_act="silu", use_parallel_residual=False,
    )
    cfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=8,
    )
    model = Flamingo(cfg=cfg)
    B, T = 2, 6
    vision_x = jnp.asarray(rng.normal(size=(B, 1, 1, 14, 14, 3)), jnp.float32)
    ids = rng.integers(7, VOCAB, size=(B, T))
    ids[:, 0] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)

    out_std = flamingo_generate(model, params, vision_x, ids, mask, gen_cfg)
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        out_fused = flamingo_generate(
            model, params, vision_x, ids, mask, gen_cfg
        )
        # scan engine with GQA too
        import dataclasses as _dc

        from test_scan_layers import _scan_variables

        scanned = Flamingo(cfg=_dc.replace(cfg, scan_layers=True))
        s_vars = _scan_variables(params, model)
        out_scan = flamingo_generate(
            scanned, s_vars, vision_x, ids, mask, gen_cfg
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False

    np.testing.assert_array_equal(np.asarray(out_std), np.asarray(out_fused))
    np.testing.assert_array_equal(np.asarray(out_std), np.asarray(out_scan))


def test_fused_mlp_side_stream_int8(data):
    """W8A8 side dot: int8 side_w + per-out-channel scales + dynamic
    per-row activation quant in-kernel must equal the w8a8.py recipe
    exactly (same rounding points), with LN/act fused before the quant
    and bias/residual applied after dequant."""
    import jax.numpy as jnp

    from open_flamingo_tpu.ops.w8a8 import quantize_activations
    from open_flamingo_tpu.quantize import quantize_weight

    x = data(B, K)
    w1, w2 = data(K, K2, scale=0.05), data(K2, N, scale=0.05)
    ln_s = data(K, scale=1.0)
    sm, sk, sn = 32, 128, 192
    sx, sw = data(sm, sk), data(sk, sn, scale=0.05)
    sls, slb = data(sk, scale=1.0), data(sk, scale=0.1)
    sb, sres = data(sn, scale=0.1), data(sm, sn)
    swq, sws = quantize_weight(sw, axis=0)

    want_main = reference_mlp(x, w1, w2, ln_scale=ln_s, act="gelu")
    got_main, got_side = fused_mlp(
        x, w1, w2, ln_scale=ln_s, act="gelu",
        block_k2=128, interpret=True,
        side_x=sx, side_w=swq, side_w_scale=sws,
        side_ln=(sls, slb), side_b=sb, side_residual=sres,
    )
    np.testing.assert_allclose(got_main, want_main, atol=3e-5)

    # reference: f32 LN -> dynamic per-row quant -> int8 dot -> dequant
    sh = np.asarray(sx, np.float64)
    mu = sh.mean(-1, keepdims=True)
    var = ((sh - mu) ** 2).mean(-1, keepdims=True)
    sh = (sh - mu) / np.sqrt(var + 1e-5)
    sh = sh * np.asarray(sls) + np.asarray(slb)
    xq, xs = quantize_activations(jnp.asarray(sh, jnp.float32))
    want = (
        np.asarray(xq, np.int32) @ np.asarray(swq, np.int32)
    ).astype(np.float64) * np.asarray(xs, np.float64) * np.asarray(
        sws, np.float64
    )
    want = want + np.asarray(sb, np.float64) + np.asarray(sres, np.float64)
    np.testing.assert_allclose(got_side, want, atol=2e-4, rtol=1e-5)
