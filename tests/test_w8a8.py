"""W8A8 int8 prefill path (ops/w8a8.py + PDense + quantize_prefill_params):
error bounds for the dynamic-activation matmul, the T>=MIN_TOKENS gate
(decode/T=1 must stay bf16-bitwise), and model-level quality plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.ops import w8a8


@pytest.fixture(autouse=True)
def _reset_w8a8():
    old = (w8a8.ENABLED, w8a8.MIN_TOKENS)
    yield
    w8a8.ENABLED, w8a8.MIN_TOKENS = old


def test_w8a8_dot_error_bound(rng):
    """Dynamic per-row activation quant + per-channel weight quant:
    the relative error of a gaussian matmul stays below ~1%."""
    from open_flamingo_tpu.quantize import quantize_weight

    B, T, K, N = 2, 32, 256, 384
    x = jnp.asarray(rng.normal(size=(B, T, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    w_q, w_s = quantize_weight(w, axis=0)
    got = w8a8.w8a8_dot(x, w_q, w_s)
    want = x @ w
    err = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
        np.asarray(want)
    )
    assert err < 0.01, err


def test_w8a8_dot_zero_rows_exact(rng):
    from open_flamingo_tpu.quantize import quantize_weight

    x = jnp.zeros((1, 16, 64), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    w_q, w_s = quantize_weight(w, axis=0)
    got = w8a8.w8a8_dot(x, w_q, w_s)
    np.testing.assert_array_equal(np.asarray(got), 0.0)


def test_w8a8_dot_bias(rng):
    from open_flamingo_tpu.quantize import quantize_weight

    x = jnp.asarray(rng.normal(size=(1, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    w_q, w_s = quantize_weight(w, axis=0)
    got = w8a8.w8a8_dot(x, w_q, w_s, bias=b)
    want = x @ w + b
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_pdense_gate_t1_bitwise(rng):
    """With W8A8 enabled and qparams bound, a T=1 (decode-shaped) input
    must take the bf16 path bit-for-bit — the MIN_TOKENS gate."""
    from open_flamingo_tpu.models.layers import PDense
    from open_flamingo_tpu.quantize import quantize_weight

    mod = PDense(64, 32, use_bias=False, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64)))
    kern = params["params"]["kernel"]
    w_q, w_s = quantize_weight(kern, axis=0)
    variables = {**params, "qparams": {"kernel_q": w_q, "kernel_s": w_s}}
    x1 = jnp.asarray(rng.normal(size=(2, 1, 64)), jnp.float32)

    w8a8.ENABLED = True
    got = mod.apply(variables, x1)
    w8a8.ENABLED = False
    want = mod.apply(params, x1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pdense_w8a8_engages(rng):
    """T>=MIN_TOKENS with qparams bound: output differs from bf16 (the
    activation rounding) but stays within the W8A8 error bound."""
    from open_flamingo_tpu.models.layers import PDense
    from open_flamingo_tpu.quantize import quantize_weight

    mod = PDense(64, 32, use_bias=True, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 64)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    kern = params["params"]["kernel"]
    w_q, w_s = quantize_weight(kern, axis=0)
    variables = {**params, "qparams": {"kernel_q": w_q, "kernel_s": w_s}}

    w8a8.ENABLED = True
    got = mod.apply(variables, x)
    w8a8.ENABLED = False
    want = mod.apply(params, x)
    err = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(
        np.asarray(want)
    )
    assert 0 < err < 0.02, err


def test_vit_w8a8_tokens_close(rng):
    """Full ViT forward with the vision qparams side-car: patch tokens
    within ~2% relative error of the bf16 path."""
    from open_flamingo_tpu.models.vit import VisionConfig, VisionTransformer
    from open_flamingo_tpu.quantize import quantize_prefill_params

    cfg = VisionConfig(
        image_size=28, patch_size=7, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128,
    )
    vit = VisionTransformer(cfg=cfg, dtype=jnp.float32)
    px = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    params = vit.init(jax.random.PRNGKey(0), px)
    # wrap in the REAL flamingo tree key ("vision_encoder", not
    # "vision" — the mismatch once left the ViT unquantized end-to-end)
    wrapped = {"params": {"vision_encoder": params["params"],
                          "lm": {"q_proj": {}}}}
    qtree = quantize_prefill_params(wrapped)["qparams"]["vision_encoder"]

    want = np.asarray(vit.apply(params, px))
    w8a8.ENABLED = True
    w8a8.MIN_TOKENS = 8
    got = np.asarray(vit.apply({**params, "qparams": qtree}, px))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert 0 < rel < 0.02, rel


@pytest.mark.parametrize("scan", [False, True])
def test_generate_int8_prefill_quality(rng, scan):
    """End-to-end: generate with --int8_prefill semantics (W8A8 prefill
    + vision, int8 weight decode) matches the bf16 greedy tokens on a
    tiny model at >=75% (tie-flips on random tiny models are benign;
    same gate as the int8 decode quality test)."""
    import dataclasses

    from test_quantize import _tiny_family_model

    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.quantize import quantize_prefill_params

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    if scan:
        from open_flamingo_tpu.models.flamingo import Flamingo
        from open_flamingo_tpu.models.lm import to_scanned_layout

        lm_sc = to_scanned_layout(
            jax.tree.map(np.asarray, params["params"]["lm"]),
            model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
        )
        p = dict(params["params"])
        p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
        params = {"params": p}
        model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    variables_q = quantize_prefill_params(params)
    # the side-car must actually cover the REAL vision subtree — the
    # "vision" vs "vision_encoder" key mismatch once made this a no-op
    assert "vision_encoder" in variables_q["qparams"]
    assert any(
        "kernel_q" in sub
        for sub in jax.tree.leaves(
            variables_q["qparams"]["vision_encoder"],
            is_leaf=lambda x: isinstance(x, dict) and "kernel_q" in x,
        )
    )
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                               eos_token_id=-1)
    out_ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, gen_cfg)
    )
    w8a8.ENABLED = True
    w8a8.MIN_TOKENS = 4
    out_q = np.asarray(
        flamingo_generate(model, variables_q, vision_x, ids, mask, gen_cfg)
    )
    match = (out_ref == out_q).mean()
    assert match >= 0.75, (match, out_ref, out_q)


def test_generate_int4_w8a8_compose_quality(rng):
    """Round-4 composition: --int4_decode + --int8_prefill in one run.
    activate_int4_stream keeps the int8-stored int4-grid copy, PDense's
    W8A8 path consumes it during prefill, and the decode loop streams
    the S4 copy — tokens match the bf16 greedy at >=75% on a tiny
    model (same gate as the int8/int4 quality tests)."""
    import dataclasses

    from test_quantize import _tiny_family_model

    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout
    from open_flamingo_tpu.quantize import quantize_prefill_params

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    variables_q = quantize_prefill_params(params, bits=4)
    # LM decode weights on the int4 grid, ViT side-car int8
    assert any(
        "kernel_q4" in sub
        for sub in jax.tree.leaves(
            variables_q["qparams"]["lm"],
            is_leaf=lambda x: isinstance(x, dict) and "kernel_q4" in x,
        )
    )
    assert "vision_encoder" in variables_q["qparams"]
    gen_cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                               eos_token_id=-1)
    out_ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, gen_cfg)
    )
    w8a8.ENABLED = True
    w8a8.MIN_TOKENS = 4
    out_q = np.asarray(
        flamingo_generate(model, variables_q, vision_x, ids, mask, gen_cfg)
    )
    match = (out_ref == out_q).mean()
    assert match >= 0.75, (match, out_ref, out_q)
