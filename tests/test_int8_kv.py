"""int8 KV + media caches (GenerationConfig.int8_kv): kernel-level
parity of the int8-cache attend kernels vs the jnp mirror, the prefill
write path (update_layer_kv quantize + dequant), and end-to-end scan
generate quality per family. Interpret mode; the on-TPU A/B lives in
scripts_dev/tpu_int8kv_ab.py / BASELINE.md."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import (
    KVCache,
    LayerKV,
    kv_scale_layout,
    quantize_kv,
)


from open_flamingo_tpu.ops.decode_layer import (
    attend_out_decode,
    attn_block_decode,
    reference_attend_out,
)


def qkv_cache(x):
    """(x_q, head-leading scales) for a (.., B, H, S, Dh) cache."""
    xq, xs = quantize_kv(x)
    return xq, kv_scale_layout(xs)


def test_attend_out_decode_int8kv_update(rng):
    b, h, dh, d, s_len = 4, 4, 32, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    kq, ks = qkv_cache(kf)
    vq, vs = qkv_cache(vf)
    mask = jnp.ones((b, s_len), jnp.int32)
    w = jnp.asarray(rng.normal(size=(h, dh, d)) * 0.05, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    got = attend_out_decode(
        q, kq, vq, mask, w, scale=dh**-0.5, k_new=kn, v_new=vn,
        slot=7, residual=res, k_scale=ks, v_scale=vs, interpret=True,
    )
    want = reference_attend_out(
        q, kq, vq, mask, w, scale=dh**-0.5, k_new=kn, v_new=vn,
        slot=7, residual=res, k_scale=ks, v_scale=vs,
    )
    for g, wv in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wv), rtol=2e-4, atol=2e-4
        )


def test_attend_out_decode_int8kv_stacked_gqa(rng):
    """Stacked (scan) cache + GQA heads; untouched layers unchanged."""
    L, b, h, hkv, dh, d, s_len = 3, 4, 4, 2, 32, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(L, b, hkv, s_len, dh)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(L, b, hkv, s_len, dh)), jnp.float32)
    kq, ks = qkv_cache(kf)
    vq, vs = qkv_cache(vf)
    mask = jnp.ones((b, s_len), jnp.int32)
    w = jnp.asarray(rng.normal(size=(L, h, dh, d)) * 0.05, jnp.float32)
    kn = jnp.asarray(rng.normal(size=(b, hkv, dh)), jnp.float32)
    vn = jnp.asarray(rng.normal(size=(b, hkv, dh)), jnp.float32)
    slot, li = 7, 1
    got = attend_out_decode(
        q, kq, vq, mask, w, scale=dh**-0.5, k_new=kn, v_new=vn,
        slot=slot, layer_idx=li, k_scale=ks, v_scale=vs, interpret=True,
    )
    want = reference_attend_out(
        q, kq[li], vq[li], mask, w[li], scale=dh**-0.5, k_new=kn,
        v_new=vn, slot=slot, k_scale=ks[li], v_scale=vs[li],
    )
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-4, atol=2e-4
    )
    originals = (kq, vq, ks, vs)
    for gi in (1, 2, 3, 4):
        np.testing.assert_allclose(
            np.asarray(got[gi][li]), np.asarray(want[gi]),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got[gi][0]), np.asarray(originals[gi - 1][0])
        )


def test_attend_out_decode_int8kv_readonly_media(rng):
    """Media path: int8 static cache, no update, gated rows."""
    b, h, dh, d, s_len = 4, 4, 32, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, dh)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    kq, ks = qkv_cache(kf)
    vq, vs = qkv_cache(vf)
    mask = jnp.asarray(rng.integers(0, 2, size=(b, s_len)), jnp.int32)
    mask = mask.at[0].set(0)   # one all-masked row -> exact zeros
    w = jnp.asarray(rng.normal(size=(h, dh, d)) * 0.05, jnp.float32)
    got = attend_out_decode(
        q, kq, vq, mask, w, scale=dh**-0.5, gate=jnp.asarray(0.7),
        k_scale=ks, v_scale=vs, interpret=True,
    )
    want = reference_attend_out(
        q, kq, vq, mask, w, scale=dh**-0.5, gate=jnp.asarray(0.7),
        k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(np.asarray(got)[0], 0.0)


def test_attn_block_decode_int8kv(rng):
    b, h, dh, s_len = 4, 4, 32, 32
    d = h * dh
    x = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(d, 3 * d)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    kf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(b, h, s_len, dh)), jnp.float32)
    kq, ks = qkv_cache(kf)
    vq, vs = qkv_cache(vf)
    mask = jnp.ones((b, s_len), jnp.int32)
    slot = 7
    y, kn_, vn_, ksn, vsn = attn_block_decode(
        x, ln_s, None, wq, wo, kq, vq, mask,
        heads=h, head_dim=dh, scale=dh**-0.5,
        fused_qkv=True, slot=slot, clip=6.0,
        k_scale=ks, v_scale=vs, interpret=True,
    )
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = np.maximum(0.0, (xf**2).mean(-1, keepdims=True) - mu**2)
    hN = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s
    qkv = jnp.clip(hN @ wq, -6.0, 6.0)
    qq, kk, vv = jnp.split(qkv, 3, axis=-1)
    want, kw, vw, ksw, vsw = reference_attend_out(
        qq.reshape(b, h, dh), kq, vq, mask, wo.reshape(h, dh, d),
        scale=dh**-0.5, k_new=kk.reshape(b, h, dh),
        v_new=vv.reshape(b, h, dh), slot=slot, k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want) + np.asarray(xf),
        rtol=3e-4, atol=3e-4,
    )
    np.testing.assert_array_equal(np.asarray(kn_), np.asarray(kw))
    np.testing.assert_array_equal(np.asarray(vn_), np.asarray(vw))
    np.testing.assert_allclose(np.asarray(ksn), np.asarray(ksw), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vsn), np.asarray(vsw), rtol=1e-6)


def test_update_layer_kv_int8_roundtrip(rng):
    """Prefill write: the returned full arrays are dequant(quant(k)) and
    the cache holds the int8 values + scales."""
    from open_flamingo_tpu.models.decoders.common import (
        AttnInputs,
        update_layer_kv,
    )

    b, h, s_max, dh, t = 2, 3, 16, 8, 4
    layer = LayerKV(
        k=jnp.zeros((b, h, s_max, dh), jnp.int8),
        v=jnp.zeros((b, h, s_max, dh), jnp.int8),
        k_s=jnp.ones((h, b, s_max), jnp.float32),
        v_s=jnp.ones((h, b, s_max), jnp.float32),
    )
    k = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
    attn = AttnInputs(
        mask=jnp.ones((b, 1, t, s_max), bool),
        position_ids=jnp.zeros((b, t), jnp.int32),
        kv_slot=jnp.asarray(2, jnp.int32),
        kv_len=s_max,
    )
    k_full, v_full, new = update_layer_kv(layer, k, v, attn)
    assert new.k.dtype == jnp.int8 and new.int8
    kh = k.transpose(0, 2, 1, 3)
    kq, ks = quantize_kv(kh)      # scales (B, H, T)
    np.testing.assert_array_equal(np.asarray(new.k[:, :, 2:6]), np.asarray(kq))
    np.testing.assert_allclose(
        np.asarray(new.k_s[:, :, 2:6]), np.asarray(kv_scale_layout(ks))
    )
    np.testing.assert_allclose(
        np.asarray(k_full[:, :, 2:6]),
        np.asarray(kq.astype(jnp.float32) * ks[..., None]),
        rtol=1e-6,
    )
    # untouched slots stay zero / scale 1
    np.testing.assert_array_equal(np.asarray(new.k[:, :, :2]), 0)
    np.testing.assert_array_equal(np.asarray(new.k_s[:, :, 6:]), 1.0)


@pytest.mark.parametrize(
    "family", ["mpt", "gptneox", "llama", "gptj", "opt"]
)
def test_generate_int8_kv_quality(rng, family, monkeypatch):
    """End-to-end: scan model, FORCE_FUSED+INTERPRET, int8_kv greedy
    tokens match bf16 at >=0.75 (tie-flips on tiny random models are
    benign — same gate as the int8 weight tests); the int8 cache must
    actually be created (engagement spy on KVCache.create)."""
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu import generation
    from open_flamingo_tpu.generation import (
        GenerationConfig,
        flamingo_generate,
    )
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout
    from open_flamingo_tpu.ops import dense_stream

    model, params, vision_x, ids, mask = _tiny_family_model(family, rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))

    created = {}
    real_create = KVCache.create

    def spy(*args, **kwargs):
        created["int8"] = kwargs.get("int8", False)
        return real_create(*args, **kwargs)

    monkeypatch.setattr(generation.KVCache, "create", spy)
    gen = GenerationConfig(max_new_tokens=6, pad_token_id=0, eos_token_id=-1)
    monkeypatch.setattr(dense_stream, "FORCE_FUSED", True)
    monkeypatch.setattr(dense_stream, "INTERPRET", True)
    out_ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, gen)
    )
    assert created["int8"] is False
    out_q = np.asarray(
        flamingo_generate(
            model, params, vision_x, ids, mask,
            dataclasses.replace(gen, int8_kv=True),
        )
    )
    assert created["int8"] is True
    match = (out_ref == out_q).mean()
    assert match >= 0.75, (match, out_ref, out_q)


def test_int8_kv_gate_off_unscanned(rng, monkeypatch):
    """int8_kv on an unrolled (non-scan) model silently stays bf16."""
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu import generation
    from open_flamingo_tpu.generation import (
        GenerationConfig,
        flamingo_generate,
    )

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    created = {}
    real_create = KVCache.create

    def spy(*args, **kwargs):
        created["int8"] = kwargs.get("int8", False)
        return real_create(*args, **kwargs)

    monkeypatch.setattr(generation.KVCache, "create", spy)
    gen = GenerationConfig(
        max_new_tokens=3, pad_token_id=0, eos_token_id=-1, int8_kv=True
    )
    flamingo_generate(model, params, vision_x, ids, mask, gen)
    assert created["int8"] is False


def test_gather_beams_int8_scales_follow_values(rng):
    """_gather_beams on an int8 stacked cache: the head-leading scale
    planes must be permuted with the SAME beam indices as the values."""
    from open_flamingo_tpu.generation import _gather_beams

    G, b, k, h, s, dh = 2, 2, 3, 4, 8, 8
    bk = b * k
    kf = jnp.asarray(rng.normal(size=(G, bk, h, s, dh)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(G, bk, h, s, dh)), jnp.float32)
    kq, ks = qkv_cache(kf)          # scales (G, H, BK, S)
    vq, vs = qkv_cache(vf)
    cache = KVCache(
        layers=(LayerKV(k=kq, v=vq, k_s=ks, v_s=vs),),
        index=jnp.asarray(3, jnp.int32),
        pad_mask=jnp.asarray(rng.integers(0, 2, size=(bk, s)), bool),
    )
    idx = jnp.asarray(rng.integers(0, k, size=(b, k)), jnp.int32)
    out = _gather_beams(cache, idx, b, k)
    l, li = out.layers[0], cache.layers[0]
    for bi in range(b):
        for ki in range(k):
            src = bi * k + int(idx[bi, ki])
            dst = bi * k + ki
            np.testing.assert_array_equal(
                np.asarray(l.k[:, dst]), np.asarray(li.k[:, src])
            )
            np.testing.assert_array_equal(
                np.asarray(l.k_s[:, :, dst]), np.asarray(li.k_s[:, :, src])
            )
            np.testing.assert_array_equal(
                np.asarray(l.v_s[:, :, dst]), np.asarray(li.v_s[:, :, src])
            )
            np.testing.assert_array_equal(
                np.asarray(out.pad_mask[dst]),
                np.asarray(cache.pad_mask[src]),
            )
    assert int(out.index) == 3


def test_generate_int8_kv_beam_quality(rng, monkeypatch):
    """Beam search with int8_kv: engages (spy) and matches bf16 beam
    tokens at >=0.75 on a tiny scan model (FORCE_FUSED+INTERPRET)."""
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu import generation
    from open_flamingo_tpu.generation import (
        GenerationConfig,
        flamingo_generate,
    )
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout
    from open_flamingo_tpu.ops import dense_stream

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))

    created = {}
    real_create = KVCache.create

    def spy(*args, **kwargs):
        created["int8"] = kwargs.get("int8", False)
        return real_create(*args, **kwargs)

    monkeypatch.setattr(generation.KVCache, "create", spy)
    monkeypatch.setattr(dense_stream, "FORCE_FUSED", True)
    monkeypatch.setattr(dense_stream, "INTERPRET", True)
    gen = GenerationConfig(
        max_new_tokens=5, num_beams=3, pad_token_id=0,
        eos_token_id=-1, length_penalty=0.0,
    )
    out_ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, gen)
    )
    assert created["int8"] is False
    out_q = np.asarray(
        flamingo_generate(
            model, params, vision_x, ids, mask,
            dataclasses.replace(gen, int8_kv=True),
        )
    )
    assert created["int8"] is True
    match = (out_ref == out_q).mean()
    assert match >= 0.75, (match, out_ref, out_q)
