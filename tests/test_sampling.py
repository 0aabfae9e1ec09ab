"""Sampling-path generation tests (do_sample / temperature / top-k /
top-p — the HF generate kwargs surface the reference exposes)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate

from test_flamingo import EOC, PAD, tiny_flamingo, make_batch


def _setup(rng):
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    return model, params, vision_x, ids, mask


def test_sampling_seed_dependence(rng):
    model, params, vision_x, ids, mask = _setup(rng)
    cfg = GenerationConfig(
        max_new_tokens=8, do_sample=True, temperature=1.5, pad_token_id=PAD
    )
    a = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask, cfg, rng=jax.random.PRNGKey(1)))
    a2 = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask, cfg, rng=jax.random.PRNGKey(1)))
    b = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask, cfg, rng=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(a, a2)  # deterministic given the key
    assert not np.array_equal(a, b)       # key changes the sample


def test_topk1_equals_greedy(rng):
    model, params, vision_x, ids, mask = _setup(rng)
    greedy = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(max_new_tokens=6, pad_token_id=PAD),
    ))
    topk1 = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(
            max_new_tokens=6, do_sample=True, top_k=1, pad_token_id=PAD
        ),
        rng=jax.random.PRNGKey(3),
    ))
    np.testing.assert_array_equal(greedy, topk1)


def test_top_p_filtering_extreme(rng):
    """top_p -> 0 keeps only the max-prob token == greedy."""
    model, params, vision_x, ids, mask = _setup(rng)
    greedy = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(max_new_tokens=5, pad_token_id=PAD),
    ))
    tp = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(
            max_new_tokens=5, do_sample=True, top_p=1e-6, pad_token_id=PAD
        ),
        rng=jax.random.PRNGKey(4),
    ))
    np.testing.assert_array_equal(greedy, tp)


def test_min_new_tokens_blocks_eos(rng):
    model, params, vision_x, ids, mask = _setup(rng)
    out = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(
            max_new_tokens=6, min_new_tokens=4, eos_token_id=EOC,
            pad_token_id=PAD,
        ),
    ))
    assert not (out[:, :4] == EOC).any()
