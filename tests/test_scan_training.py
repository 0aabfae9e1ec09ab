"""Training with scan_layers: trainable partition picks up groups/xattn,
and a train step moves the gates."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.train.optimizer import (
    OptimizerConfig,
    make_optimizer,
    split_params,
)
from open_flamingo_tpu.train.train_loop import (
    TrainLoopConfig,
    TrainState,
    make_train_step,
)

from test_flamingo import EOC, MEDIA, PAD, VOCAB, make_batch, tiny_flamingo

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'


def test_scan_training_partition_and_step(rng):
    base = tiny_flamingo()
    cfg = dataclasses.replace(base.cfg, scan_layers=True)
    model = Flamingo(cfg=cfg)
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    variables = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)

    train, frozen = split_params(variables)
    names = ["/".join(k) for k in train]
    assert any("groups/xattn" in n for n in names), names[:5]
    assert not any("block_" in n for n in names)

    tx = make_optimizer(
        OptimizerConfig(learning_rate=3e-3, warmup_steps=0),
        media_token_id=MEDIA, eoc_token_id=EOC,
    )
    step = jax.jit(make_train_step(model, tx, TrainLoopConfig(pad_token_id=PAD)))
    state = TrainState.create(train, tx)
    batch = {"vision_x": vision_x, "input_ids": ids, "attention_mask": mask}
    state, metrics = step(state, frozen, batch, batch)
    assert np.isfinite(float(metrics["loss"]))
    gate_key = next(k for k in train if k[-1] == "attn_gate")
    assert np.abs(np.asarray(state.params[gate_key])).max() > 0
