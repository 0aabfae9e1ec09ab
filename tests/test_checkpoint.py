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
    assert any(k.startswith("lang_encoder.gated_cross_attn_layers.0.") for k in sd)
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
