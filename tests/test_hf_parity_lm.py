"""fp32 logit parity of FlamingoLM decoder families vs HF torch models
(tiny random configs — the SURVEY.md §7 'north star' verification applied
per component, network-free)."""

import numpy as np
import pytest

import jax.numpy as jnp
import jax

from open_flamingo_tpu.convert.hf_lm import (
    config_from_hf,
    convert_lm_params,
    to_numpy_state_dict,
)
from open_flamingo_tpu.models.lm import FlamingoLM

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'

torch = pytest.importorskip("torch")

B, T, VOCAB = 2, 12, 96


def _hf_model(family):
    import transformers

    if family == "mpt":
        cfg = transformers.MptConfig(
            d_model=64,
            n_heads=4,
            n_layers=2,
            vocab_size=VOCAB,
            max_seq_len=64,
            attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
                attn_pdrop=0.0
            ),
            resid_pdrop=0.0,
            emb_pdrop=0.0,
        )
        return transformers.MptForCausalLM(cfg)
    if family == "gptneox":
        cfg = transformers.GPTNeoXConfig(
            hidden_size=64,
            num_attention_heads=4,
            num_hidden_layers=2,
            intermediate_size=128,
            vocab_size=VOCAB,
            rotary_pct=0.25,
            max_position_embeddings=64,
            use_parallel_residual=True,
            attention_dropout=0.0,
            hidden_dropout=0.0,
        )
        return transformers.GPTNeoXForCausalLM(cfg)
    if family == "llama":
        cfg = transformers.LlamaConfig(
            hidden_size=64,
            num_attention_heads=4,
            num_key_value_heads=2,
            num_hidden_layers=2,
            intermediate_size=128,
            vocab_size=VOCAB,
            max_position_embeddings=64,
            attention_dropout=0.0,
        )
        return transformers.LlamaForCausalLM(cfg)
    if family == "gptj":
        cfg = transformers.GPTJConfig(
            n_embd=64, n_head=4, n_layer=2, rotary_dim=8, vocab_size=VOCAB,
            n_positions=64, attn_pdrop=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
            tie_word_embeddings=False,
        )
        return transformers.GPTJForCausalLM(cfg)
    if family == "opt":
        cfg = transformers.OPTConfig(
            hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
            ffn_dim=128, vocab_size=VOCAB, max_position_embeddings=64,
            dropout=0.0, attention_dropout=0.0, word_embed_proj_dim=64,
        )
        return transformers.OPTForCausalLM(cfg)
    raise ValueError(family)


def _parity(family, attention_mask, rng, atol=3e-4):
    torch.manual_seed(0)
    hf = _hf_model(family).eval()
    cfg = config_from_hf(hf.config)
    params = {"params": convert_lm_params(to_numpy_state_dict(hf), cfg)}
    params = jax.tree.map(jnp.asarray, params)

    ids = rng.integers(0, VOCAB, size=(B, T))
    mask_t = torch.tensor(attention_mask, dtype=torch.long)
    with torch.no_grad():
        pos = (mask_t.cumsum(-1) - 1).clamp(min=0)
        kwargs = {}
        if family in ("gptneox", "llama", "gptj", "opt"):
            kwargs["position_ids"] = pos
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=mask_t, **kwargs
        ).logits.numpy()

    model = FlamingoLM(cfg=cfg)
    got, _ = model.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(attention_mask, jnp.int32)
    )
    got = np.asarray(got)

    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=atol, rtol=1e-4)


FAMILIES = ["mpt", "gptneox", "llama", "gptj", "opt"]


@pytest.mark.parametrize("family", FAMILIES)
def test_full_mask_parity(family, rng):
    _parity(family, np.ones((B, T), np.int64), rng)


@pytest.mark.parametrize("family", FAMILIES)
def test_left_pad_parity(family, rng):
    mask = np.ones((B, T), np.int64)
    mask[0, :3] = 0
    mask[1, :5] = 0
    _parity(family, mask, rng)
