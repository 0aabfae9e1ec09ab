"""int8 weight-streaming decode: kernel-level exactness (weights on the
int8 grid -> fused int8 path must match the bf16 reference bit-for-bit
up to fp32 matmul noise) and quantization-error bounds on gaussian
weights. Interpret mode; the on-TPU A/B lives in bench.py/BASELINE.md."""

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
from open_flamingo_tpu.ops.decode_layer import (
    attend_out_decode,
    attn_block_decode,
    reference_attend_out,
)

B, K, N, K2 = 8, 256, 384, 512


def quant_ref(w, axis):
    """Per-channel symmetric int8 quantization (numpy reference)."""
    amax = np.max(np.abs(np.asarray(w, np.float32)), axis=axis)
    scale = np.where(amax == 0, 1.0, amax / 127.0).astype(np.float32)
    exp = [slice(None)] * w.ndim
    for a in np.atleast_1d(axis):
        exp[a] = None
    w_q = np.clip(np.round(w / scale[tuple(exp)]), -127, 127).astype(np.int8)
    return jnp.asarray(w_q), jnp.asarray(scale)


def grid_weight(rng, *shape, axis=0):
    """A weight already exactly on an int8 grid: w = w_q * s."""
    w_q = rng.integers(-127, 128, size=shape).astype(np.float32)
    # per-out-channel scales, exact in bf16 (powers of two)
    out_dim = shape[1 - axis] if len(shape) == 2 else shape[-1]
    s = 2.0 ** rng.integers(-10, -6, size=out_dim).astype(np.float32)
    return w_q, s


def test_fused_dense_int8_exact(rng):
    w_q, s = grid_weight(rng, K, N)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    w = jnp.asarray(w_q * s[None, :], jnp.float32)
    got = fused_dense(
        x, jnp.asarray(w_q, jnp.int8), w_scale=jnp.asarray(s),
        block_n=128, interpret=True,
    )
    want = reference_dense(x, w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_dense_int8_transposed_ragged(rng):
    # tied-embedding logits path: (V, K) streamed transposed, ragged V
    v_dim = 300
    w_q, s = grid_weight(rng, v_dim, K, axis=1)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    w = jnp.asarray(w_q * s[:, None], jnp.float32)
    got = fused_dense(
        x, jnp.asarray(w_q, jnp.int8), w_scale=jnp.asarray(s),
        w_transposed=True, block_n=128, interpret=True,
    )
    want = reference_dense(x, w.T)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_mlp_int8_exact(rng):
    w1_q, s1 = grid_weight(rng, K, K2)
    w2_q, s2 = grid_weight(rng, K2, N)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    ln_s = jnp.asarray(rng.normal(size=(K,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(B, N)), jnp.float32)
    w1 = jnp.asarray(w1_q * s1[None, :], jnp.float32)
    w2 = jnp.asarray(w2_q * s2[None, :], jnp.float32)
    got = fused_mlp(
        x, jnp.asarray(w1_q, jnp.int8), jnp.asarray(w2_q, jnp.int8),
        w1_scale=jnp.asarray(s1), w2_scale=jnp.asarray(s2),
        ln_scale=ln_s, act="gelu", residual=res,
        block_k2=128, interpret=True,
    )
    want = reference_mlp(x, w1, w2, ln_scale=ln_s, act="gelu", residual=res)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_fused_mlp_int8_swiglu_ragged_k2(rng):
    k2 = 352
    w1_q, s1 = grid_weight(rng, K, k2)
    wg_q, sg = grid_weight(rng, K, k2)
    w2_q, s2 = grid_weight(rng, k2, N)
    x = jnp.asarray(rng.normal(size=(B, K)) * 0.2, jnp.float32)
    got = fused_mlp(
        x, jnp.asarray(w1_q, jnp.int8), jnp.asarray(w2_q, jnp.int8),
        w1_gate=jnp.asarray(wg_q, jnp.int8),
        w1_scale=jnp.asarray(s1), w2_scale=jnp.asarray(s2),
        w1_gate_scale=jnp.asarray(sg),
        act="silu", block_k2=128, interpret=True,
    )
    want = reference_mlp(
        x, jnp.asarray(w1_q * s1[None, :], jnp.float32),
        jnp.asarray(w2_q * s2[None, :], jnp.float32),
        w1_gate=jnp.asarray(wg_q * sg[None, :], jnp.float32),
        act="silu",
    )
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_attend_out_decode_int8(rng):
    b, h, dh, d, s_len = 4, 4, 32, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    mask = jnp.ones((b, s_len), jnp.int32)
    w_q = rng.integers(-127, 128, size=(h, dh, d)).astype(np.float32)
    s = 2.0 ** rng.integers(-10, -6, size=d).astype(np.float32)
    res = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    got = attend_out_decode(
        q, k, v, mask, jnp.asarray(w_q, jnp.int8),
        scale=dh**-0.5, wout_scale=jnp.asarray(s),
        residual=res, interpret=True,
    )
    want = reference_attend_out(
        q, k, v, mask, jnp.asarray(w_q * s[None, None, :], jnp.float32),
        scale=dh**-0.5, residual=res,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attn_block_decode_int8(rng):
    b, h, dh, s_len = 4, 4, 32, 32
    d = h * dh
    x = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    wq_q = rng.integers(-127, 128, size=(d, 3 * d)).astype(np.float32)
    sq = 2.0 ** rng.integers(-12, -8, size=3 * d).astype(np.float32)
    wo_q = rng.integers(-127, 128, size=(d, d)).astype(np.float32)
    so = 2.0 ** rng.integers(-12, -8, size=d).astype(np.float32)
    kc = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    vc = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    mask = jnp.ones((b, s_len), jnp.int32)
    slot = 7

    got, kn, vn = attn_block_decode(
        x, ln_s, None,
        jnp.asarray(wq_q, jnp.int8), jnp.asarray(wo_q, jnp.int8),
        kc, vc, mask,
        heads=h, head_dim=dh, scale=dh**-0.5,
        fused_qkv=True, slot=slot, clip=6.0,
        wq_scale=jnp.asarray(sq), wout_scale=jnp.asarray(so),
        interpret=True,
    )

    # einsum mirror with the dequantized weights
    wq = jnp.asarray(wq_q * sq[None, :], jnp.float32)
    wo = jnp.asarray(wo_q * so[None, :], jnp.float32)
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum(0.0, (xf**2).mean(-1, keepdims=True) - mu**2)
    hN = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s
    qkv = jnp.clip(hN @ wq, -6.0, 6.0)
    qq, kk, vv = jnp.split(qkv, 3, axis=-1)
    qq = qq.reshape(b, h, dh)
    kk = kk.reshape(b, h, dh)
    vv = vv.reshape(b, h, dh)
    want, kw, vw = reference_attend_out(
        qq, kc, vc, mask, wo.reshape(h, dh, d).astype(jnp.float32),
        scale=dh**-0.5, k_new=kk, v_new=vv, slot=slot,
    )
    np.testing.assert_allclose(got, np.asarray(want) + np.asarray(xf),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(kn, kw, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(vn, vw, rtol=1e-5, atol=1e-5)


# ---- model-level plumbing tests -------------------------------------------


def _tiny_family_model(family, rng):
    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig

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
    return model, params, vision_x, ids, mask


@pytest.mark.parametrize(
    "family,bits",
    [("mpt", 8), ("gptneox", 8), ("llama", 8), ("gptj", 8), ("opt", 8),
     ("mpt", 4), ("llama", 4), ("gptj", 4)],
)
def test_generate_int8_matches_roundtripped_bf16(rng, family, bits):
    """End-to-end plumbing: with weights replaced by dequant(quant(w)),
    the int8/int4 fused decode must produce the same greedy tokens as
    the full-precision fused decode over the same (round-tripped)
    params — the quantization grid is exact, so only fp32 rounding
    differs."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream
    from open_flamingo_tpu.quantize import (
        dequantize_roundtrip,
        quantize_decode_params,
    )

    model, params, vision_x, ids, mask = _tiny_family_model(family, rng)
    params_rt = dequantize_roundtrip(params, bits=bits)
    variables_q = quantize_decode_params(params_rt, bits=bits)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)

    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        out_ref = flamingo_generate(
            model, params_rt, vision_x, ids, mask, gen_cfg
        )
        out_q = flamingo_generate(
            model, variables_q, vision_x, ids, mask, gen_cfg
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_q))


def test_fused_dense_int4_exact(rng):
    """Weights on the int4 grid: the int4 fused path must match the
    dequantized reference up to fp32 matmul noise (kernel-level proof
    that the jnp.int4 ref load + cast is semantically exact)."""
    w_q = rng.integers(-7, 8, size=(K, N)).astype(np.float32)
    s = 2.0 ** rng.integers(-8, -4, size=N).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(B, K)), jnp.float32)
    w = jnp.asarray(w_q * s[None, :], jnp.float32)
    got = fused_dense(
        x, jnp.asarray(w_q, jnp.int4), w_scale=jnp.asarray(s),
        block_n=128, interpret=True,
    )
    want = reference_dense(x, w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_int4_quality_drift_small(rng):
    """On raw gaussian weights, int4 decode (per-out-channel scales)
    still greedy-matches the bf16 fused path most of the time at tiny
    scale — a plumbing sanity floor, not a production quality claim."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream
    from open_flamingo_tpu.quantize import quantize_decode_params

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    variables_q = quantize_decode_params(params, bits=4)
    # the non-head side-car is stored int8-on-the-int4-grid under
    # kernel_q4 (S4 cannot cross the axon jit boundary); generate
    # materializes true int4 in-graph via activate_int4_stream
    def count_q4(t):
        n = 0
        for k, v in t.items():
            if k == "kernel_q4":
                assert v.dtype == jnp.int8
                assert jnp.max(jnp.abs(v.astype(jnp.int32))) <= 7
                n += 1
            elif isinstance(v, dict):
                n += count_q4(v)
        return n

    assert count_q4(variables_q["qparams"]["lm"]) > 0
    from open_flamingo_tpu.quantize import activate_int4_stream

    act = activate_int4_stream(variables_q)
    int4_leaves = [
        leaf
        for leaf in jax.tree.leaves(act["qparams"])
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.int4
    ]
    assert len(int4_leaves) > 0
    # the int8-stored copy stays (same buffer) for the W8A8 prefill
    # path; every activated parent carries BOTH kernel_q (S4) and
    # kernel_q4 (int8-on-int4-grid)
    assert count_q4(act["qparams"]["lm"]) == count_q4(
        variables_q["qparams"]["lm"]
    )
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                               eos_token_id=-1)
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        out_ref = np.asarray(flamingo_generate(
            model, params, vision_x, ids, mask, gen_cfg
        ))
        out_q = np.asarray(flamingo_generate(
            model, variables_q, vision_x, ids, mask, gen_cfg
        ))
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    match = (out_ref == out_q).mean()
    assert match >= 0.5, (match, out_ref, out_q)


def test_int8_quality_drift_small(rng):
    """On raw (non-roundtripped) gaussian weights, int8 decode logits
    must stay close to the bf16 fused logits (weight-only per-channel
    int8 is near-lossless)."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream
    from open_flamingo_tpu.quantize import quantize_decode_params

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    variables_q = quantize_decode_params(params)
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                               eos_token_id=-1)
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        out_ref = np.asarray(flamingo_generate(
            model, params, vision_x, ids, mask, gen_cfg
        ))
        out_q = np.asarray(flamingo_generate(
            model, variables_q, vision_x, ids, mask, gen_cfg
        ))
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    match = (out_ref == out_q).mean()
    assert match >= 0.75, (match, out_ref, out_q)


def test_strip_resident_params_generate_matches(rng, monkeypatch):
    """int8-resident: bf16 kernels dropped, generate (scan engine,
    FORCE_FUSED+INTERPRET, W8A8 prefill) is bitwise the unstripped int8
    path — the kernels only ever read the int8 side-car."""
    import dataclasses

    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout
    from open_flamingo_tpu.ops import dense_stream, w8a8
    from open_flamingo_tpu.quantize import (
        quantize_prefill_params,
        strip_resident_params,
    )

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    vq = quantize_prefill_params(params)
    vs = strip_resident_params(vq)
    # every quantized parent (kernel_q at the same path) lost its bf16
    # kernel, in BOTH subtrees
    def leftover(p, q):
        n = 0
        for name, sub in p.items():
            qs = q.get(name) if isinstance(q, dict) else None
            if isinstance(sub, dict) and isinstance(qs, dict):
                if "kernel_q" in qs:
                    n += "kernel" in sub
                else:
                    n += leftover(sub, qs)
        return n

    for top in ("lm", "vision_encoder"):
        assert leftover(vs["params"][top], vs["qparams"][top]) == 0
        assert leftover(vq["params"][top], vq["qparams"][top]) > 0
    n_full = sum(x.size for x in jax.tree.leaves(vq["params"]))
    n_strip = sum(x.size for x in jax.tree.leaves(vs["params"]))
    assert n_strip < 0.6 * n_full
    # the embedding table survives (input gather needs it)
    assert "embedding" in vs["params"]["lm"]["wte"]

    monkeypatch.setattr(dense_stream, "FORCE_FUSED", True)
    monkeypatch.setattr(dense_stream, "INTERPRET", True)
    monkeypatch.setattr(w8a8, "ENABLED", True)
    monkeypatch.setattr(w8a8, "MIN_TOKENS", 4)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=0, eos_token_id=-1)
    want = np.asarray(flamingo_generate(model, vq, vision_x, ids, mask, gen))
    got = np.asarray(flamingo_generate(model, vs, vision_x, ids, mask, gen))
    np.testing.assert_array_equal(got, want)


def test_strip_resident_params_dequant_fallback(rng, monkeypatch):
    """Without W8A8, stripped prefill falls back to dequantized dense
    weights in-graph — quality-gated vs the bf16 path (>=0.75 token
    match, same gate as int8 decode)."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.quantize import (
        quantize_prefill_params,
        strip_resident_params,
    )

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=0, eos_token_id=-1)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, gen)
    )
    vs = strip_resident_params(quantize_prefill_params(params))
    got = np.asarray(flamingo_generate(model, vs, vision_x, ids, mask, gen))
    match = (got == want).mean()
    assert match >= 0.75, (match, got, want)


def test_strip_resident_requires_qparams(rng):
    from open_flamingo_tpu.quantize import strip_resident_params

    model, params, *_ = _tiny_family_model("mpt", rng)
    with pytest.raises(ValueError):
        strip_resident_params(params)
