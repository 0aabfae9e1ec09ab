"""Real-width fp32 parity vs HF (round-1 VERDICT item 6): the tiny-config
suite (d=64) says little about error accumulation at released dimensions.
Single decoder blocks at the released widths (MPT d=2048/OF-3B, MPT
d=4096/OF-9B, GPT-NeoX d=2560/OF-4B) and a real-width ViT-L/14 block, via
1-layer HF models with shared random weights; plus a full-depth
OF-3B-shape bf16-vs-fp32 logit check establishing the bf16 tolerance.

Vocab is shrunk to 4096 (embedding rows don't affect block-width error);
hidden/head/intermediate dims are the released ones
(/root/reference/open_flamingo/src/factory.py:65-70 model table,
configs.py MPT_1B/MPT_7B/REDPAJAMA_3B)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'


from open_flamingo_tpu.convert.hf_lm import (
    config_from_hf,
    convert_lm_params,
    to_numpy_state_dict,
)
from open_flamingo_tpu.models.lm import FlamingoLM

torch = pytest.importorskip("torch")

B, T, VOCAB = 2, 16, 4096


def _mpt(d_model, n_heads, seed):
    import transformers

    cfg = transformers.MptConfig(
        d_model=d_model, n_heads=n_heads, n_layers=1, vocab_size=VOCAB,
        max_seq_len=2048,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            attn_pdrop=0.0
        ),
        resid_pdrop=0.0, emb_pdrop=0.0,
    )
    torch.manual_seed(seed)
    return transformers.MptForCausalLM(cfg)


def _gptneox(d_model, n_heads, seed):
    import transformers

    cfg = transformers.GPTNeoXConfig(
        hidden_size=d_model, num_attention_heads=n_heads,
        num_hidden_layers=1, intermediate_size=4 * d_model,
        vocab_size=VOCAB, rotary_pct=1.0, max_position_embeddings=2048,
        use_parallel_residual=False, attention_dropout=0.0,
        hidden_dropout=0.0,
    )
    torch.manual_seed(seed)
    return transformers.GPTNeoXForCausalLM(cfg)


def _parity(hf, rng, atol):
    hf = hf.eval()
    cfg = config_from_hf(hf.config)
    params = {"params": convert_lm_params(to_numpy_state_dict(hf), cfg)}
    params = jax.tree.map(jnp.asarray, params)

    ids = rng.integers(0, VOCAB, size=(B, T))
    mask = np.ones((B, T), np.int64)
    mask[0, :3] = 0  # left-pad row, the eval-harness layout
    mask_t = torch.tensor(mask)
    kwargs = {}
    if cfg.family in ("gptneox",):
        kwargs["position_ids"] = (mask_t.cumsum(-1) - 1).clamp(min=0)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=mask_t, **kwargs
        ).logits.numpy()

    got, _ = FlamingoLM(cfg=cfg).apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    got = np.asarray(got)
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=atol, rtol=1e-4)


def test_mpt_block_d2048_of3b_width(rng):
    """MPT-1B width (OF-3B decoder block): d=2048, 16 heads."""
    _parity(_mpt(2048, 16, seed=0), rng, atol=2e-3)


@pytest.mark.slow
def test_mpt_block_d4096_of9b_width(rng):
    """MPT-7B width (OF-9B decoder block): d=4096, 32 heads."""
    _parity(_mpt(4096, 32, seed=1), rng, atol=4e-3)


def test_gptneox_block_d2560_of4b_width(rng):
    """RedPajama-3B width (OF-4B decoder block): d=2560, 32 heads, full
    rotary, sequential residual."""
    _parity(_gptneox(2560, 32, seed=2), rng, atol=2e-3)


def test_vit_l_block_real_width(rng):
    """One ViT-L/14 block at released dims (d=1024, 16 heads, 257 tokens
    incl. CLS) vs HF CLIPVisionModel."""
    import transformers

    from open_flamingo_tpu.convert.hf_clip import (
        convert_clip_vision_params,
        vision_config_from_hf,
    )
    from open_flamingo_tpu.models.vit import VisionTransformer

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=224, patch_size=14, hidden_size=1024,
        num_hidden_layers=1, num_attention_heads=16,
        intermediate_size=4096, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(3)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = dataclasses.replace(
        vision_config_from_hf(hf_cfg), post_ln_tokens=False
    )
    params = {"params": convert_clip_vision_params(hf.state_dict(), cfg)}
    params = jax.tree.map(jnp.asarray, params)

    imgs = rng.normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()[:, 1:]
    got = np.asarray(VisionTransformer(cfg=cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_of3b_full_depth_bf16_tolerance(rng):
    """Full-depth OF-3B decoder shape (24 x d=2048 MPT layers): bf16
    compute must track the fp32 logits within the tolerance the eval
    harness relies on (argmax/rank stability, not bitwise)."""
    from open_flamingo_tpu.models.decoders.common import DecoderConfig

    cfg = DecoderConfig(
        family="mpt", vocab_size=VOCAB, hidden_size=2048, num_layers=24,
        num_heads=16, intermediate_size=8192, max_position_embeddings=2048,
        alibi=True, attention_bias=False, ln_no_bias=True,
        tie_word_embeddings=True,
    )
    model32 = FlamingoLM(cfg=cfg)
    ids = jnp.asarray(rng.integers(0, VOCAB, size=(1, T)), jnp.int32)
    mask = jnp.ones_like(ids)
    params = model32.init(jax.random.PRNGKey(0), ids, mask)

    logits32, _ = model32.apply(params, ids, mask)
    model16 = FlamingoLM(cfg=cfg, dtype=jnp.bfloat16)
    logits16, _ = model16.apply(params, ids, mask)

    l32 = np.asarray(logits32, np.float32)
    l16 = np.asarray(logits16, np.float32)
    # logits are fp32 outputs of bf16 matmuls: expect <~0.15 absolute
    # drift at |logits| ~ O(10); argmax must agree on the last position
    assert np.max(np.abs(l32 - l16)) < 0.25, np.max(np.abs(l32 - l16))
    assert int(l32[0, -1].argmax()) == int(l16[0, -1].argmax())
