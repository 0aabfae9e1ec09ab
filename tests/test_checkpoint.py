"""Checkpoint tests: orbax save/resume roundtrip, auto-resume discovery,
released-.pt-format converter roundtrip (export -> import == identity)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.convert.flamingo_ckpt import (
    convert_flamingo_checkpoint,
    export_flamingo_checkpoint,
)
from open_flamingo_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from open_flamingo_tpu.train.optimizer import (
    OptimizerConfig,
    make_optimizer,
    split_params,
)
from open_flamingo_tpu.train.train_loop import TrainState

from test_flamingo import EOC, MEDIA, VOCAB, tiny_flamingo


def _state(rng):
    model = tiny_flamingo()
    vision_x = jnp.asarray(rng.normal(size=(1, 1, 1, 14, 14, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(7, VOCAB, size=(1, 6)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), vision_x, ids, jnp.ones_like(ids))
    train, frozen = split_params(variables)
    tx = make_optimizer(
        OptimizerConfig(warmup_steps=0), media_token_id=MEDIA, eoc_token_id=EOC
    )
    return variables, TrainState.create(train, tx), tx


def test_orbax_roundtrip(tmp_path, rng):
    variables, state, tx = _state(rng)
    run = str(tmp_path / "run")
    save_checkpoint(run, state, epoch=0)
    state2 = state.replace(
        params={k: v + 1.0 for k, v in state.params.items()},
        step=state.step + 5,
    )
    save_checkpoint(run, state2, epoch=1)
    assert latest_checkpoint(run).endswith("checkpoint_1")

    restored = load_checkpoint(latest_checkpoint(run), state)
    assert int(restored.step) == 5
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(restored.params[k]), np.asarray(state2.params[k])
        )


def test_keep_last(tmp_path, rng):
    _, state, _ = _state(rng)
    run = str(tmp_path / "run")
    for e in range(3):
        save_checkpoint(run, state, epoch=e, keep_last=2)
    import os

    assert sorted(os.listdir(run)) == ["checkpoint_1", "checkpoint_2"]


def test_reference_pt_converter_roundtrip(rng):
    variables, state, _ = _state(rng)
    # randomize so the roundtrip is meaningful (gates are zeros at init)
    params = jax.tree.map(
        lambda x: jnp.asarray(rng.normal(size=x.shape), x.dtype),
        variables["params"],
    )
    sd = export_flamingo_checkpoint({"params": params})
    assert "perceiver.latents" in sd
    # released-checkpoint naming: FlamingoLayer path, not the ModuleList
    # aliases that filter_state_dict_to_trainable deletes
    assert any(
        k.startswith("lang_encoder.transformer.blocks.0.gated_cross_attn_layer.")
        for k in sd
    )
    assert not any("gated_cross_attn_layers" in k for k in sd)
    assert "lang_encoder.transformer.wte.weight" in sd

    back = convert_flamingo_checkpoint(sd)
    for mod in ("perceiver", "lm"):
        flat_ours = jax.tree_util.tree_leaves_with_path(back[mod])
        assert flat_ours
    # spot-check exact values through the roundtrip
    np.testing.assert_allclose(
        back["perceiver"]["latents"], np.asarray(params["perceiver"]["latents"])
    )
    np.testing.assert_allclose(
        back["lm"]["xattn_0"]["attn"]["to_q"]["kernel"],
        np.asarray(params["lm"]["xattn_0"]["attn"]["to_q"]["kernel"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        back["lm"]["xattn_1"]["ff"]["fc2"]["kernel"],
        np.asarray(params["lm"]["xattn_1"]["ff"]["fc2"]["kernel"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        back["lm"]["wte"]["embedding"], np.asarray(params["lm"]["wte"]["embedding"])
    )


def test_converter_accepts_modulelist_naming_and_family_embeddings(rng):
    """Pre-filter ModuleList naming + llama/gptneox embedding keys must also
    convert (ADVICE r1: released checkpoints use FlamingoLayer naming, but
    unfiltered saves and other families exist)."""
    d, dv = 8, 6
    def lin(i, o):
        return np.asarray(rng.normal(size=(o, i)), np.float32)

    sd = {}
    for base in (
        "lang_encoder.gated_cross_attn_layers.1",
        "lang_encoder.gpt_neox.layers.3.gated_cross_attn_layer",
    ):
        sd[f"{base}.attn_gate"] = np.zeros((1,), np.float32)
        sd[f"{base}.ff_gate"] = np.zeros((1,), np.float32)
        sd[f"{base}.attn.norm.weight"] = np.ones((d,), np.float32)
        sd[f"{base}.attn.norm.bias"] = np.zeros((d,), np.float32)
        sd[f"{base}.attn.to_q.weight"] = lin(d, d)
        sd[f"{base}.attn.to_kv.weight"] = lin(dv, 2 * d)
        sd[f"{base}.attn.to_out.weight"] = lin(d, d)
        sd[f"{base}.ff.0.weight"] = np.ones((d,), np.float32)
        sd[f"{base}.ff.0.bias"] = np.zeros((d,), np.float32)
        sd[f"{base}.ff.1.weight"] = lin(d, 4 * d)
        sd[f"{base}.ff.3.weight"] = lin(4 * d, d)
    sd["lang_encoder.model.embed_tokens.weight"] = lin(d, 32)  # llama naming
    sd["lang_encoder.embed_out.weight"] = lin(d, 32)  # gptneox untied head

    conv = convert_flamingo_checkpoint(sd)
    assert set(k for k in conv["lm"] if k.startswith("xattn_")) == {
        "xattn_1",
        "xattn_3",
    }
    np.testing.assert_allclose(
        conv["lm"]["xattn_3"]["attn"]["to_q"]["kernel"],
        sd["lang_encoder.gpt_neox.layers.3.gated_cross_attn_layer.attn.to_q.weight"].T,
    )
    assert conv["lm"]["wte"]["embedding"].shape == (32, d)
    assert conv["lm"]["lm_head"]["kernel"].shape == (d, 32)


def test_converter_rejects_xattn_free_checkpoint(rng):
    """A checkpoint with perceiver weights but unrecognized xattn keys must
    raise instead of silently grafting an unconditioned base LM."""
    import pytest

    sd = {"perceiver.latents": np.zeros((4, 8), np.float32)}
    with pytest.raises(ValueError, match="unconditioned"):
        convert_flamingo_checkpoint(sd)
