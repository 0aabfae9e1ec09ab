"""Training-step tests: label masking truth vs a loop transcription of the
reference semantics, frozen/trainable partition, loss decrease, NaN skip."""

import jax
import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.train.losses import (
    IGNORE,
    mask_labels_interleaved,
    mask_labels_paired,
)
from open_flamingo_tpu.train.optimizer import (
    OptimizerConfig,
    is_trainable,
    make_optimizer,
    split_params,
)
from open_flamingo_tpu.train.train_loop import (
    TrainLoopConfig,
    TrainState,
    make_train_step,
)

from test_flamingo import EOC, MEDIA, PAD, VOCAB, tiny_flamingo

B = 2


def ref_mask_interleaved(ids, pad_id, media_id, eoc_id):
    """Direct loop transcription of train_utils.py:127-149 semantics."""
    labels = ids.copy()
    labels[labels == pad_id] = IGNORE
    for i in range(labels.shape[0]):
        j = 0
        while j < labels.shape[1] and labels[i, j] != media_id:
            labels[i, j] = IGNORE
            j += 1
        for e in np.where(labels[i] == eoc_id)[0]:
            k = e + 1
            while k < labels.shape[1] and labels[i, k] != media_id:
                labels[i, k] = IGNORE
                k += 1
    labels[labels == media_id] = IGNORE
    return labels


def test_mask_labels_interleaved_matches_reference_loops(rng):
    for _ in range(20):
        ids = rng.integers(0, 12, size=(3, 24))
        # sprinkle special tokens
        want = ref_mask_interleaved(ids.copy(), PAD, MEDIA, EOC)
        got = np.asarray(
            mask_labels_interleaved(jnp.asarray(ids), PAD, MEDIA, EOC)
        )
        np.testing.assert_array_equal(got, want)


def test_mask_labels_paired():
    ids = np.array([[PAD, MEDIA, 9, 8, EOC, PAD]])
    got = np.asarray(mask_labels_paired(jnp.asarray(ids), PAD, MEDIA))
    np.testing.assert_array_equal(got, [[IGNORE, IGNORE, 9, 8, EOC, IGNORE]])


def _setup(rng):
    model = tiny_flamingo()
    vision_x = jnp.asarray(rng.normal(size=(B, 2, 1, 14, 14, 3)), jnp.float32)
    ids = rng.integers(7, VOCAB, size=(B, 12))
    ids[:, 0] = MEDIA
    ids[:, 5] = EOC
    ids[:, 6] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    variables = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    batch = {"vision_x": vision_x, "input_ids": ids, "attention_mask": mask}
    return model, variables, batch


def test_trainable_partition(rng):
    model, variables, _ = _setup(rng)
    train, frozen = split_params(variables)
    names = ["/".join(k) for k in train]
    assert any("perceiver" in n for n in names)
    assert any("xattn_" in n for n in names)
    assert any("/wte/" in n for n in names)
    assert not any("vision_encoder" in n for n in names)
    assert not any("/blocks_" in n and "xattn" not in n for n in names)
    fro = ["/".join(k) for k in frozen]
    assert any("vision_encoder" in n for n in fro)


def test_train_step_decreases_loss_and_respects_freezing(rng):
    model, variables, batch = _setup(rng)
    train, frozen = split_params(variables)
    tx = make_optimizer(
        OptimizerConfig(learning_rate=3e-3, warmup_steps=0, weight_decay=0.1),
        media_token_id=MEDIA,
        eoc_token_id=EOC,
    )
    cfg = TrainLoopConfig(pad_token_id=PAD)
    step = jax.jit(make_train_step(model, tx, cfg))
    state = TrainState.create(train, tx)

    losses = []
    for _ in range(8):
        state, metrics = step(state, frozen, batch, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses

    # embedding rows other than MEDIA/EOC must be untouched
    wte_key = next(k for k in train if k[-2:] == ("wte", "embedding"))
    before = np.asarray(train[wte_key])
    after = np.asarray(state.params[wte_key])
    moved = np.any(np.abs(after - before) > 0, axis=-1)
    assert moved[MEDIA] and moved[EOC]
    others = np.ones(len(moved), bool)
    others[[MEDIA, EOC]] = False
    assert not moved[others].any()

    # gates must have moved off zero
    gate_key = next(k for k in train if k[-1] == "attn_gate")
    assert np.abs(np.asarray(state.params[gate_key])).max() > 0


def test_train_step_accepts_uint8_vision(rng):
    """The device-preprocess path: uint8 vision_x normalizes in-graph and
    matches the loss computed from the host-normalized float batch."""
    from open_flamingo_tpu.image_processing import (
        CLIP_MEAN,
        CLIP_STD,
        normalize_images_on_device,
    )

    model, variables, batch = _setup(rng)
    u8 = rng.integers(0, 256, size=(B, 2, 1, 14, 14, 3)).astype(np.uint8)
    host = (np.asarray(u8, np.float32) / 255.0 - np.asarray(CLIP_MEAN)) / (
        np.asarray(CLIP_STD)
    )
    bu = dict(batch, vision_x=jnp.asarray(u8))
    bf = dict(batch, vision_x=jnp.asarray(host, jnp.float32))

    train, frozen = split_params(variables)
    tx = make_optimizer(
        OptimizerConfig(learning_rate=0.0, warmup_steps=0, weight_decay=0.0),
        media_token_id=MEDIA, eoc_token_id=EOC,
    )
    cfg = TrainLoopConfig(pad_token_id=PAD)
    step = jax.jit(make_train_step(model, tx, cfg))
    state = TrainState.create(train, tx)
    _, m_u = step(state, frozen, bu, bu)
    _, m_f = step(state, frozen, bf, bf)
    np.testing.assert_allclose(
        float(m_u["loss"]), float(m_f["loss"]), rtol=1e-5
    )
    # sanity on the normalize helper itself
    np.testing.assert_allclose(
        np.asarray(normalize_images_on_device(jnp.asarray(u8))), host,
        atol=1e-6,
    )


def test_gradient_accumulation_equals_big_batch(rng):
    """optax.MultiSteps over k micro-batches must produce the same update
    as one k-sized batch step (reference grad-accum semantics,
    train_utils.py:117,211-216)."""
    import optax

    model, variables, batch = _setup(rng)
    train, frozen = split_params(variables)
    opt_cfg = OptimizerConfig(learning_rate=3e-3, warmup_steps=0,
                              weight_decay=0.1)
    cfg = TrainLoopConfig(pad_token_id=PAD)

    # two distinct micro-batches (different ids) + their concatenation
    ids2 = np.asarray(batch["input_ids"]).copy()
    ids2[:, -3:] = (ids2[:, -3:] + 1) % (VOCAB - 8) + 7
    micro2 = {
        "vision_x": batch["vision_x"],
        "input_ids": jnp.asarray(ids2),
        "attention_mask": batch["attention_mask"],
    }
    big = {
        k: jnp.concatenate([batch[k], micro2[k]], axis=0) for k in batch
    }

    tx_big = make_optimizer(opt_cfg, media_token_id=MEDIA, eoc_token_id=EOC)
    step_big = jax.jit(make_train_step(model, tx_big, cfg))
    state_big, _ = step_big(TrainState.create(train, tx_big), frozen, big, big)

    tx_acc = optax.MultiSteps(
        make_optimizer(opt_cfg, media_token_id=MEDIA, eoc_token_id=EOC),
        every_k_schedule=2,
    )
    step_acc = jax.jit(make_train_step(model, tx_acc, cfg))
    state_acc = TrainState.create(train, tx_acc)
    state_acc, _ = step_acc(state_acc, frozen, batch, batch)
    # first micro-step: params must NOT have moved yet
    gate_key = next(k for k in train if k[-1] == "attn_gate")
    np.testing.assert_array_equal(
        np.asarray(state_acc.params[gate_key]), np.asarray(train[gate_key])
    )
    state_acc, _ = step_acc(state_acc, frozen, micro2, micro2)

    for k in train:
        np.testing.assert_allclose(
            np.asarray(state_acc.params[k]),
            np.asarray(state_big.params[k]),
            atol=1e-6,
            err_msg="/".join(k),
        )


def test_nan_skip(rng):
    model, variables, batch = _setup(rng)
    train, frozen = split_params(variables)
    tx = make_optimizer(
        OptimizerConfig(learning_rate=1e-3, warmup_steps=0),
        media_token_id=MEDIA, eoc_token_id=EOC,
    )
    step = jax.jit(make_train_step(model, tx, TrainLoopConfig(pad_token_id=PAD)))
    state = TrainState.create(train, tx)
    bad = dict(batch, vision_x=batch["vision_x"] * jnp.nan)
    new_state, metrics = step(state, frozen, bad, batch)
    assert not np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params unchanged
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(state.params[k]), np.asarray(new_state.params[k])
        )
