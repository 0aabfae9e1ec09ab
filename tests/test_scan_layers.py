"""scan_layers path: identical numerics to the unrolled stack with
converted (stacked) params — forward, KV-cache decode, and gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import KVCache
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.models.lm import to_scanned_layout

from test_flamingo import VOCAB, make_batch, tiny_flamingo


def _scan_variables(unrolled_vars, model):
    lm = jax.tree.map(np.asarray, unrolled_vars["params"]["lm"])
    lm_scanned = to_scanned_layout(
        lm, model.cfg.lm.num_layers, model.cfg.cross_attn_every_n
    )
    params = dict(unrolled_vars["params"])
    params["lm"] = jax.tree.map(jnp.asarray, lm_scanned)
    return {"params": params}


@pytest.mark.parametrize("every_n", [1, 2])
def test_scan_matches_unrolled(rng, every_n):
    base = tiny_flamingo()
    cfg = dataclasses.replace(base.cfg, cross_attn_every_n=every_n)
    unrolled = Flamingo(cfg=cfg)
    scanned = Flamingo(cfg=dataclasses.replace(cfg, scan_layers=True))

    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    u_vars = unrolled.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(u_vars, unrolled)

    want, lat_w, _ = unrolled.apply(u_vars, vision_x, ids, mask)
    got, lat_g, _ = scanned.apply(s_vars, vision_x, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # cached decode through the scan path
    cache = KVCache.create(cfg.lm, ids.shape[0], ids.shape[1] + 2)
    pre, _, cache = scanned.apply(
        s_vars, None, ids[:, :7], mask[:, :7], media_latents=lat_g, cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(want)[:, :7], atol=2e-5
    )
    step, cache = scanned.apply(
        s_vars, lat_g, ids[:, 7:8], mask[:, 7:8], cache,
        jnp.full((ids.shape[0],), 2, jnp.int32),
        method=Flamingo.decode_step,
    )
    np.testing.assert_allclose(
        np.asarray(step)[:, 0], np.asarray(want)[:, 7], atol=2e-5
    )


def test_scan_gradients_match(rng):
    base = tiny_flamingo()
    cfg = base.cfg
    unrolled = Flamingo(cfg=cfg)
    scanned = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True, gradient_checkpointing=True)
    )
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    u_vars = unrolled.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(u_vars, Flamingo(cfg=cfg))

    def loss_u(v):
        logits, _, _ = unrolled.apply(v, vision_x, ids, mask)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    def loss_s(v):
        logits, _, _ = scanned.apply(v, vision_x, ids, mask)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    gu = jax.grad(loss_u)(u_vars)["params"]["lm"]
    gs = jax.grad(loss_s)(s_vars)["params"]["lm"]
    # compare a stacked leaf against its per-layer counterparts
    got = np.asarray(gs["groups"]["block_0"]["Wqkv"]["kernel"])
    for i in range(cfg.lm.num_layers):
        want = np.asarray(gu[f"blocks_{i}"]["Wqkv"]["kernel"])
        np.testing.assert_allclose(got[i], want, atol=3e-5)
    got_x = np.asarray(gs["groups"]["xattn"]["attn"]["to_q"]["kernel"])
    for i in range(cfg.lm.num_layers):
        want = np.asarray(gu[f"xattn_{i}"]["attn"]["to_q"]["kernel"])
        np.testing.assert_allclose(got_x[i], want, atol=3e-5)


@pytest.mark.parametrize("every_n", [1, 2])
def test_scan_fused_generate_matches_unrolled(rng, every_n):
    """The stacked-weight scan decode engine (models/scan_decode.py)
    must produce the same greedy tokens as the unrolled standard path."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream

    base = tiny_flamingo()
    cfg = dataclasses.replace(base.cfg, cross_attn_every_n=every_n)
    unrolled = Flamingo(cfg=cfg)
    scanned = Flamingo(cfg=dataclasses.replace(cfg, scan_layers=True))
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    u_vars = unrolled.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(u_vars, unrolled)
    gen_cfg = GenerationConfig(max_new_tokens=5, pad_token_id=0,
                               eos_token_id=-1)
    ref = np.asarray(
        flamingo_generate(unrolled, u_vars, vision_x, ids, mask, gen_cfg)
    )
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        got = np.asarray(
            flamingo_generate(scanned, s_vars, vision_x, ids, mask, gen_cfg)
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("family", ["gptneox", "llama", "gptj", "opt"])
def test_scan_fused_generate_families(rng, family):
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream

    model, u_vars, vision_x, ids, mask = _tiny_family_model(family, rng)
    scanned = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    s_vars = _scan_variables(u_vars, model)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)
    ref = np.asarray(
        flamingo_generate(model, u_vars, vision_x, ids, mask, gen_cfg)
    )
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        got = np.asarray(
            flamingo_generate(scanned, s_vars, vision_x, ids, mask, gen_cfg)
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    np.testing.assert_array_equal(got, ref)


def test_scan_fused_generate_int8(rng):
    """scan engine x int8 streaming: round-tripped weights decode to the
    same tokens quantized or not."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.ops import dense_stream
    from open_flamingo_tpu.quantize import (
        dequantize_roundtrip,
        quantize_decode_params,
    )

    base = tiny_flamingo()
    scanned = Flamingo(cfg=dataclasses.replace(base.cfg, scan_layers=True))
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    u_vars = base.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(u_vars, base)
    s_vars = dequantize_roundtrip(s_vars)
    s_vars_q = quantize_decode_params(s_vars)
    gen_cfg = GenerationConfig(max_new_tokens=4, pad_token_id=0,
                               eos_token_id=-1)
    dense_stream.FORCE_FUSED = True
    dense_stream.INTERPRET = True
    try:
        ref = np.asarray(
            flamingo_generate(scanned, s_vars, vision_x, ids, mask, gen_cfg)
        )
        got = np.asarray(
            flamingo_generate(scanned, s_vars_q, vision_x, ids, mask,
                              gen_cfg)
        )
    finally:
        dense_stream.FORCE_FUSED = False
        dense_stream.INTERPRET = False
    np.testing.assert_array_equal(got, ref)


def test_scan_beam_generate_matches_unrolled(rng):
    """Beam search over the group-stacked scan cache: the beam gather
    must reorder the (G, B*K, ...) cache arrays on axis 1."""
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate

    base = tiny_flamingo()
    unrolled = Flamingo(cfg=base.cfg)
    scanned = Flamingo(cfg=dataclasses.replace(base.cfg, scan_layers=True))
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    u_vars = unrolled.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(u_vars, unrolled)
    gen_cfg = GenerationConfig(
        max_new_tokens=5, num_beams=3, pad_token_id=0, eos_token_id=-1
    )
    ref = np.asarray(
        flamingo_generate(unrolled, u_vars, vision_x, ids, mask, gen_cfg)
    )
    got = np.asarray(
        flamingo_generate(scanned, s_vars, vision_x, ids, mask, gen_cfg)
    )
    np.testing.assert_array_equal(got, ref)
