"""Incremental decode with the explicit KVCache must reproduce the full
forward pass exactly (per-family), including left-padded prompts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.decoders.common import DecoderConfig, KVCache
from open_flamingo_tpu.models.lm import FlamingoLM

B, T_PROMPT, T_GEN, VOCAB = 2, 7, 4, 64

CONFIGS = {
    "mpt": DecoderConfig(
        family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, alibi=True, attention_bias=False, ln_no_bias=True,
    ),
    "gptneox": DecoderConfig(
        family="gptneox", vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, rotary_pct=0.25, tie_word_embeddings=False,
    ),
    "llama": DecoderConfig(
        family="llama", vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, attention_bias=False,
        tie_word_embeddings=False, layer_norm_eps=1e-6,
    ),
    "gptj": DecoderConfig(
        family="gptj", vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, rotary_dim=4, attention_bias=False,
        tie_word_embeddings=False, lm_head_bias=True,
    ),
    "opt": DecoderConfig(
        family="opt", vocab_size=VOCAB, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, attention_bias=True, tie_word_embeddings=True,
    ),
}


@pytest.mark.parametrize("family", list(CONFIGS))
@pytest.mark.parametrize("left_pad", [False, True])
def test_decode_matches_full_forward(family, left_pad, rng):
    cfg = CONFIGS[family]
    total = T_PROMPT + T_GEN
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(B, total)), jnp.int32)
    mask = np.ones((B, total), np.int32)
    if left_pad:
        mask[0, :2] = 0
        mask[1, :4] = 0
    mask = jnp.asarray(mask)

    model = FlamingoLM(cfg=cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    full_logits, _ = model.apply(params, ids, mask)
    full_logits = np.asarray(full_logits)

    # prefill on the prompt, then decode one token at a time
    cache = KVCache.create(cfg, B, max_length=total + 3)
    logits, cache = model.apply(
        params, ids[:, :T_PROMPT], mask[:, :T_PROMPT], cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(logits)[np.asarray(mask[:, :T_PROMPT], bool)],
        full_logits[:, :T_PROMPT][np.asarray(mask[:, :T_PROMPT], bool)],
        atol=2e-5, rtol=1e-5,
    )
    assert int(cache.index) == T_PROMPT

    for t in range(T_PROMPT, total):
        step_logits, cache = model.apply(
            params, ids[:, t : t + 1], mask[:, t : t + 1], cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits)[:, 0], full_logits[:, t], atol=2e-5, rtol=1e-5
        )
