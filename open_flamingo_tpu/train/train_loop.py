"""The pjit'd training step: dual-source (paired + interleaved) loss,
frozen-param partition, NaN-skip, grad accumulation.

Replaces open_flamingo/train/train_utils.py:46-297. The reference runs two
sequential fwd/bwd passes per step (LAION then MMC4); the summed-loss
single pass here accumulates identical gradients (linearity of autodiff)
while letting XLA overlap both graphs. NaN-loss skip (train_utils.py:
161-169, "not FSDP-compatible" upstream) is a lax.cond here — works under
any sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..image_processing import normalize_images_on_device
from ..models.flamingo import Flamingo
from .losses import lm_loss, mask_labels_interleaved, mask_labels_paired
from .optimizer import FlatParams, merge_params


def _vision_input(model: Flamingo, vision_x: jax.Array) -> jax.Array:
    """uint8 batches (device-preprocess input path) normalize in-graph —
    fused by XLA into the first conv read; float batches pass through."""
    if vision_x.dtype == jnp.uint8:
        return normalize_images_on_device(vision_x, dtype=model.dtype)
    return vision_x


@dataclasses.dataclass(frozen=True)
class TrainLoopConfig:
    loss_multiplier_laion: float = 0.2
    loss_multiplier_mmc4: float = 1.0
    pad_token_id: int = 0
    skip_nan_batches: bool = True


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any          # trainable flat dict
    opt_state: Any

    @staticmethod
    def create(trainable: FlatParams, tx: optax.GradientTransformation):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=trainable,
            opt_state=tx.init(trainable),
        )


def batch_losses(
    model: Flamingo,
    params: Any,
    batch_laion: Dict[str, jax.Array],
    batch_mmc4: Dict[str, jax.Array],
    cfg: TrainLoopConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Per-source LM losses. Batches carry vision_x (B,T,F,H,W,C),
    input_ids (B,T_txt), attention_mask (B,T_txt)."""
    media_id = model.cfg.media_token_id
    eoc_id = model.cfg.eoc_token_id

    logits_l, _, _ = model.apply(
        params,
        _vision_input(model, batch_laion["vision_x"]),
        batch_laion["input_ids"],
        batch_laion["attention_mask"],
    )
    labels_l = mask_labels_paired(
        batch_laion["input_ids"], cfg.pad_token_id, media_id
    )
    loss_l = lm_loss(logits_l, labels_l)

    logits_m, _, _ = model.apply(
        params,
        _vision_input(model, batch_mmc4["vision_x"]),
        batch_mmc4["input_ids"],
        batch_mmc4["attention_mask"],
    )
    labels_m = mask_labels_interleaved(
        batch_mmc4["input_ids"], cfg.pad_token_id, media_id, eoc_id
    )
    loss_m = lm_loss(logits_m, labels_m)
    return loss_l, loss_m


def make_train_step(
    model: Flamingo,
    tx: optax.GradientTransformation,
    cfg: TrainLoopConfig,
):
    """Returns train_step(state, frozen, batch_laion, batch_mmc4) ->
    (state, metrics). jit/pjit-able; shard via in_shardings on the caller
    side or rely on param/batch placements."""

    def loss_fn(trainable: FlatParams, frozen: FlatParams, bl, bm):
        params = merge_params(trainable, frozen)
        loss_l, loss_m = batch_losses(model, params, bl, bm, cfg)
        total = (
            cfg.loss_multiplier_laion * loss_l + cfg.loss_multiplier_mmc4 * loss_m
        )
        return total, (loss_l, loss_m)

    def train_step(state: TrainState, frozen: FlatParams, bl, bm):
        (total, (loss_l, loss_m)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, frozen, bl, bm)

        def do_update(_):
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            )

        if cfg.skip_nan_batches:
            bad = ~jnp.isfinite(total)
            new_state = jax.lax.cond(bad, lambda _: state.replace(
                step=state.step + 1), do_update, None)
        else:
            new_state = do_update(None)

        metrics = {
            "loss": total,
            "loss_laion": loss_l,
            "loss_mmc4": loss_m,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step
