"""Weight-drop preflight dry-run on synthetic weights (VERDICT r4
missing #1): the one-command chain (scripts/preflight.py) must run
converter -> fp32 logit parity -> quantization gates end-to-end against
tiny random LOCAL HF checkpoints and write a machine-readable report,
so weight-drop day is `python -m open_flamingo_tpu.scripts.preflight`,
not a checklist."""

import json

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_dirs(tmp_path_factory):
    d_lm = tmp_path_factory.mktemp("mpt-tiny")
    d_vit = tmp_path_factory.mktemp("clip-tiny")
    torch.manual_seed(0)
    lm = transformers.MptForCausalLM(transformers.MptConfig(
        d_model=64, n_heads=4, n_layers=2, vocab_size=96, max_seq_len=64,
        attn_config=transformers.models.mpt.configuration_mpt
        .MptAttentionConfig(attn_pdrop=0.0),
        resid_pdrop=0.0, emb_pdrop=0.0,
    ))
    lm.save_pretrained(d_lm)
    vit = transformers.CLIPVisionModel(transformers.CLIPVisionConfig(
        image_size=28, patch_size=7, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_act="quick_gelu", attention_dropout=0.0,
    ))
    vit.save_pretrained(d_vit)
    return str(d_lm), str(d_vit)


def test_preflight_dry_run(hf_dirs, tmp_path):
    from open_flamingo_tpu.scripts.preflight import main

    d_lm, d_vit = hf_dirs
    out = tmp_path / "preflight.json"
    rc = main([
        "--lm_path", d_lm,
        "--vision_hf_path", d_vit,
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    stages = {s["stage"]: s for s in report["stages"]}
    assert rc == 0, report
    assert report["ok"]
    assert stages["lm_parity"]["ok"]
    assert stages["lm_parity"]["max_abs_diff_full"] < 2e-3
    assert stages["lm_parity"]["max_abs_diff_left_pad"] < 2e-3
    assert stages["vit_parity"]["ok"]
    assert stages["quant_gates"]["ok"]
    assert stages["quant_gates"]["int8_top1"] == 1.0
    assert "int4_kl" in stages["quant_gates"]


def test_preflight_fails_on_broken_weights(hf_dirs, tmp_path, monkeypatch):
    """A converter regression must turn into rc!=0, not a silent pass."""
    from open_flamingo_tpu.scripts import preflight

    d_lm, _ = hf_dirs
    import open_flamingo_tpu.convert.hf_lm as hf_lm

    real = hf_lm.convert_lm_params

    def corrupt(sd, cfg):
        p = real(sd, cfg)
        p["wte"]["embedding"] = p["wte"]["embedding"] + 1.0
        return p

    monkeypatch.setattr(hf_lm, "convert_lm_params", corrupt)
    out = tmp_path / "preflight_bad.json"
    rc = preflight.main(["--lm_path", d_lm, "--out", str(out)])
    assert rc == 1
    report = json.loads(out.read_text())
    assert not report["ok"]
