"""Next-token loss and the reference's label-masking rules, vectorized.

Reference semantics (open_flamingo/train/train_utils.py:102-149):
  paired (LAION):     pad -> -100, <image> -> -100
  interleaved (MMC4): pad -> -100, everything before the first <image>,
                      and every span from just after an <|endofchunk|>
                      until (exclusive) the next <image>; <image> -> -100.
The reference implements the interleaved rule with per-row Python loops;
here it is O(T) vectorized with cumulative max indices (jit-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = -100


def mask_labels_paired(
    input_ids: jax.Array, pad_id: int, media_id: int
) -> jax.Array:
    drop = (input_ids == pad_id) | (input_ids == media_id)
    return jnp.where(drop, IGNORE, input_ids)


def mask_labels_interleaved(
    input_ids: jax.Array, pad_id: int, media_id: int, eoc_id: int
) -> jax.Array:
    ids = input_ids
    t = ids.shape[-1]
    is_media = ids == media_id
    is_eoc = ids == eoc_id

    # before the first <image>
    before_first = jnp.cumsum(is_media.astype(jnp.int32), axis=-1) == 0

    # last index (strictly before p) of eoc / media; -1 if none.
    idx = jax.lax.broadcasted_iota(jnp.int32, ids.shape, ids.ndim - 1)
    last_eoc = jax.lax.cummax(jnp.where(is_eoc, idx, -1), axis=ids.ndim - 1)
    last_media = jax.lax.cummax(jnp.where(is_media, idx, -1), axis=ids.ndim - 1)
    shift = lambda x: jnp.concatenate(
        [jnp.full((*x.shape[:-1], 1), -1, x.dtype), x[..., : t - 1]], axis=-1
    )
    # a position is inside an eoc->media gap iff the most recent eoc
    # (strictly before it) is more recent than the most recent media.
    in_gap = shift(last_eoc) > shift(last_media)

    drop = (ids == pad_id) | is_media | before_first | (in_gap & ~is_media)
    return jnp.where(drop, IGNORE, ids)


def lm_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Shifted cross entropy, mean over non-ignored targets (HF semantics:
    the model handles the shift, train_utils.py:101)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != IGNORE
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
