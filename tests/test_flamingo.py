"""End-to-end Flamingo model tests: forward shapes, decode-equals-full,
greedy/beam generation consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.generation import (
    GenerationConfig,
    flamingo_generate,
)
from open_flamingo_tpu.models.decoders.common import DecoderConfig, KVCache
from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig, count_media
from open_flamingo_tpu.models.vit import VisionConfig

VOCAB, MEDIA, EOC, PAD = 64, 5, 6, 1
B, T_IMG, T_TXT = 2, 2, 10


def tiny_flamingo(family="mpt"):
    vis = VisionConfig(
        image_size=14, patch_size=7, hidden_size=24, num_layers=1, num_heads=2,
        intermediate_size=32,
    )
    lm = {
        "mpt": DecoderConfig(
            family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, alibi=True, attention_bias=False,
            ln_no_bias=True,
        ),
        "gptneox": DecoderConfig(
            family="gptneox", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, rotary_pct=0.25,
            tie_word_embeddings=False,
        ),
    }[family]
    cfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=2,
        perceiver_heads=2, perceiver_dim_head=8,
    )
    return Flamingo(cfg=cfg)


def make_batch(rng):
    vision_x = jnp.asarray(
        rng.normal(size=(B, T_IMG, 1, 14, 14, 3)), jnp.float32
    )
    # <image> tokens at positions 0 and 4
    ids = rng.integers(7, VOCAB, size=(B, T_TXT))
    ids[:, 0] = MEDIA
    ids[:, 4] = MEDIA
    return vision_x, jnp.asarray(ids, jnp.int32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    return model, params, vision_x, ids, mask


def test_forward_shapes(setup):
    model, params, vision_x, ids, mask = setup
    logits, latents, _ = model.apply(params, vision_x, ids, mask)
    assert logits.shape == (B, T_TXT, VOCAB)
    assert latents.shape == (B, T_IMG, 4, 24)


def test_prefill_decode_matches_full(setup):
    """Prefill + cached-media decode steps == full forward (positions after
    the last media token, where cumsum == total count)."""
    model, params, vision_x, ids, mask = setup
    full_logits, latents, _ = model.apply(params, vision_x, ids, mask)
    full_logits = np.asarray(full_logits)

    t_prompt = 7
    cache = KVCache.create(model.cfg.lm, B, T_TXT + 2)
    logits, _, cache = model.apply(
        params, None, ids[:, :t_prompt], mask[:, :t_prompt],
        media_latents=latents, cache=cache,
    )
    np.testing.assert_allclose(
        np.asarray(logits), full_logits[:, :t_prompt], atol=2e-5, rtol=1e-5
    )
    n_media = count_media(ids[:, :t_prompt], MEDIA)
    for t in range(t_prompt, T_TXT):
        step_logits, cache = model.apply(
            params, latents, ids[:, t : t + 1], mask[:, t : t + 1], cache,
            n_media, method=Flamingo.decode_step,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits)[:, 0], full_logits[:, t], atol=2e-5, rtol=1e-5
        )


def test_media_kv_reuse_matches(setup):
    """Decode with the prefill-captured media K/V in the cache (the fused
    decode path: to_kv projection skipped every step) produces logits
    identical to recomputing the projection each step."""
    from open_flamingo_tpu.models.lm import extract_media_kv

    model, params, vision_x, ids, mask = setup
    latents = model.apply(params, vision_x, method=Flamingo.embed_vision)
    t_prompt = 7
    make = lambda: KVCache.create(model.cfg.lm, B, T_TXT + 2)

    (_, _, cache_a), variables = model.apply(
        params, None, ids[:, :t_prompt], mask[:, :t_prompt],
        media_latents=latents, cache=make(), mutable=["media_kv"],
    )
    media_kv = extract_media_kv(variables, scan_layers=False)
    assert media_kv is not None and len(media_kv) == model.cfg.lm.num_layers
    cache_a = cache_a.replace(media=media_kv)
    _, _, cache_b = model.apply(
        params, None, ids[:, :t_prompt], mask[:, :t_prompt],
        media_latents=latents, cache=make(),
    )
    n_media = count_media(ids[:, :t_prompt], MEDIA)
    step = ids[:, t_prompt : t_prompt + 1]
    m1 = mask[:, t_prompt : t_prompt + 1]
    logits_a, _ = model.apply(
        params, latents, step, m1, cache_a, n_media,
        method=Flamingo.decode_step,
    )
    logits_b, _ = model.apply(
        params, latents, step, m1, cache_b, n_media,
        method=Flamingo.decode_step,
    )
    np.testing.assert_array_equal(np.asarray(logits_a), np.asarray(logits_b))


def test_greedy_generate_matches_manual(setup):
    model, params, vision_x, ids, mask = setup
    gen = flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(max_new_tokens=5, pad_token_id=PAD),
    )
    assert gen.shape == (B, 5)

    # manual greedy
    cur_ids, cur_mask = ids, mask
    latents = model.apply(params, vision_x, method=Flamingo.embed_vision)
    out = []
    for _ in range(5):
        logits, _, _ = model.apply(
            params, None, cur_ids, cur_mask, media_latents=latents
        )
        tok = jnp.argmax(logits[:, -1], axis=-1)
        out.append(np.asarray(tok))
        cur_ids = jnp.concatenate([cur_ids, tok[:, None].astype(jnp.int32)], axis=1)
        cur_mask = jnp.concatenate(
            [cur_mask, jnp.ones((B, 1), cur_mask.dtype)], axis=1
        )
    np.testing.assert_array_equal(np.asarray(gen), np.stack(out, axis=1))


def test_beam1_matches_greedy(setup):
    model, params, vision_x, ids, mask = setup
    greedy = flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(max_new_tokens=5, pad_token_id=PAD, eos_token_id=EOC),
    )
    beam = flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(
            max_new_tokens=5, num_beams=1, pad_token_id=PAD, eos_token_id=EOC,
            length_penalty=0.0,
        ),
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam))


def test_beam_search_runs(setup):
    model, params, vision_x, ids, mask = setup
    gen = flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(
            max_new_tokens=6, num_beams=3, pad_token_id=PAD, eos_token_id=EOC,
        ),
    )
    assert gen.shape == (B, 6)


def test_left_padded_generation(setup):
    """Left-padded batch rows generate the same tokens as their unpadded
    single-row counterparts (the eval harness's batching strategy)."""
    model, params, vision_x, ids, mask = setup
    pad_cols = 3
    ids_p = jnp.concatenate(
        [jnp.full((B, pad_cols), PAD, jnp.int32), ids], axis=1
    )
    mask_p = jnp.concatenate(
        [jnp.zeros((B, pad_cols), jnp.int32), jnp.ones_like(ids)], axis=1
    )
    gen_p = flamingo_generate(
        model, params, vision_x, ids_p, mask_p,
        GenerationConfig(max_new_tokens=4, pad_token_id=PAD),
    )
    gen = flamingo_generate(
        model, params, vision_x, ids, jnp.ones_like(ids),
        GenerationConfig(max_new_tokens=4, pad_token_id=PAD),
    )
    np.testing.assert_array_equal(np.asarray(gen_p), np.asarray(gen))
