"""scripts/serve.py smoke: jsonl requests in, greedy tokens out, via
the continuous-batching ServingEngine over a tiny local HF checkpoint.
Output exactness vs flamingo_generate is tests/test_serving.py's
contract; this drives the user-facing CLI end to end."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_ckpt(tmp_path):
    import transformers

    hf_cfg = transformers.MptConfig(
        d_model=32, n_heads=4, n_layers=2, vocab_size=96, max_seq_len=128,
        attn_config=transformers.models.mpt.configuration_mpt.MptAttentionConfig(
            attn_pdrop=0.0
        ),
    )
    torch.manual_seed(0)
    hf = transformers.MptForCausalLM(hf_cfg)
    ckpt = tmp_path / "mpt-tiny"
    hf.save_pretrained(ckpt, safe_serialization=True)
    return str(ckpt)


def test_serve_synthetic(tmp_path, capsys):
    from open_flamingo_tpu.scripts.serve import main

    main([
        "--synthetic", "3",
        "--vision_encoder_path", "ViT-Tiny",
        "--lm_path", _tiny_ckpt(tmp_path),
        "--batch_rows", "2",
        "--max_seq_len", "96",
        "--max_prompt_len", "16",
        "--chunk_tokens", "4",
        "--default_max_new_tokens", "6",
        "--precision", "fp32",
    ])
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert [r["id"] for r in lines] == [0, 1, 2]
    for r in lines:
        assert len(r["token_ids"]) <= 6
        assert isinstance(r["text"], str)
    # identical synthetic prompts must emit identical tokens
    assert lines[0]["token_ids"] == lines[1]["token_ids"] == lines[2]["token_ids"]


def test_serve_jsonl_int8(tmp_path, capsys):
    """File input + --int8_decode side-car through the engine path."""
    from open_flamingo_tpu.scripts.serve import main

    req = tmp_path / "reqs.jsonl"
    req.write_text(
        json.dumps({"prompt": "<image>An image of",
                    "max_new_tokens": 5}) + "\n"
        + json.dumps({"prompt": "<image>A photo of a",
                      "max_new_tokens": 7}) + "\n"
    )
    main([
        "--requests", str(req),
        "--vision_encoder_path", "ViT-Tiny",
        "--lm_path", _tiny_ckpt(tmp_path),
        "--int8_decode",
        "--batch_rows", "2",
        "--max_seq_len", "96",
        "--max_prompt_len", "16",
        "--chunk_tokens", "4",
        "--precision", "fp32",
    ])
    lines = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert len(lines) == 2
    assert len(lines[0]["token_ids"]) <= 5
    assert len(lines[1]["token_ids"]) <= 7
