"""Tokenizer wrapper tests: HF path (special-token addition, pad token,
padding side) and SimpleTokenizer pin/cap semantics (the factory's
offline path must keep tokenizer ids == model ids)."""

import json

import numpy as np
import pytest

from open_flamingo_tpu.tokenization import (
    EOC_TOKEN,
    MEDIA_TOKEN,
    SimpleTokenizer,
    prepare_hf_tokenizer,
)


def _tiny_hf_tokenizer(tmp_path):
    """Build a GPT-2-style tokenizer from local files (offline)."""
    transformers = pytest.importorskip("transformers")
    vocab = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyz ")}
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    return transformers.GPT2Tokenizer(
        str(tmp_path / "vocab.json"),
        str(tmp_path / "merges.txt"),
        unk_token="<|endoftext|>",
        eos_token="<|endoftext|>",
    )


def test_prepare_hf_tokenizer(tmp_path):
    tok = _tiny_hf_tokenizer(tmp_path)
    base_len = len(tok)
    tok, media_id, eoc_id = prepare_hf_tokenizer(tok)
    # specials appended after base vocab; GPT2 has no pad -> <PAD> added
    assert eoc_id == base_len
    assert media_id == base_len + 1
    assert tok.pad_token == "<PAD>"
    assert tok.encode(MEDIA_TOKEN)[-1] == media_id
    assert tok.encode(EOC_TOKEN)[-1] == eoc_id
    ids = tok(f"{MEDIA_TOKEN}abc{EOC_TOKEN}")["input_ids"]
    assert ids[0] == media_id and ids[-1] == eoc_id


def test_simple_tokenizer_pin_and_cap():
    tok = SimpleTokenizer(vocab_size=16)
    eoc = tok.pin(EOC_TOKEN, 100)
    media = tok.pin(MEDIA_TOKEN, 101)
    assert tok.encode(EOC_TOKEN) == [100] and tok.encode(MEDIA_TOKEN) == [101]
    assert len(tok) == 102
    # organic vocab caps at budget; overflow words -> <unk>, never ids
    # beyond the model's embedding table
    for i in range(40):
        tok.encode(f"word{i}")
    all_ids = [i for w in range(40) for i in tok.encode(f"word{w}")]
    assert max(all_ids) < 16
    # pinned ids survive round-trip decode
    out = tok.decode([100, 101])
    assert EOC_TOKEN in out and MEDIA_TOKEN in out


def test_factory_offline_ids_consistent():
    """Regression for the verification finding: model ids must equal
    tokenizer ids on the offline path."""
    from open_flamingo_tpu.factory import create_model_and_transforms
    from test_factory import TINY_LM, TINY_VIS

    model, _, _, tok = create_model_and_transforms(
        TINY_VIS, "openai", TINY_LM
    )
    assert tok.encode(MEDIA_TOKEN)[-1] == model.cfg.media_token_id
    assert tok.encode(EOC_TOKEN)[-1] == model.cfg.eoc_token_id
    ids = tok(f"{MEDIA_TOKEN}hello world{EOC_TOKEN}", return_tensors="np")[
        "input_ids"
    ]
    assert int(np.max(ids)) < model.cfg.lm.vocab_size
