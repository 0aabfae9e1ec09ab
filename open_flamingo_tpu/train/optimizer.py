"""Optimizer, schedules, and the trainable/frozen partition.

Reference behavior replicated as optax transforms:
  * AdamW with weight decay ONLY on gated-xattn params
    (open_flamingo/train/train.py:392-408);
  * input-embedding gradients masked to the <image>/<|endofchunk|> rows
    (train_utils.py:174-196) — an optax transform instead of a grad hook;
  * global-norm grad clip 1.0 (train_utils.py:198-208);
  * constant / linear / cosine schedules with warmup (train.py:434-450).

Frozen-vs-trainable is a partition of the flat param dict: gradients are
only computed for the trainable subset (no requires_grad tricks,
SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

FlatParams = Dict[Tuple[str, ...], Any]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.1
    warmup_steps: int = 5000
    total_steps: int = 500_000
    schedule: str = "constant"  # constant | linear | cosine
    grad_clip: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


def is_trainable(path: Tuple[str, ...], freeze_lm_embeddings: bool = False) -> bool:
    """Perceiver + gated xattn (+ input embeddings unless frozen) train;
    the ViT and the base LM stay frozen (factory.py:104-113)."""
    joined = "/".join(path)
    # matches both per-layer (lm/xattn_3/...) and scanned (lm/groups/xattn)
    # layouts
    if joined.startswith("params/perceiver/") or "xattn" in joined:
        return True
    if not freeze_lm_embeddings and "/wte/" in joined:
        return True
    return False


def split_params(
    params: Any, freeze_lm_embeddings: bool = False
) -> Tuple[FlatParams, FlatParams]:
    """Variables pytree -> (trainable flat dict, frozen flat dict)."""
    flat = traverse_util.flatten_dict(params)
    train = {k: v for k, v in flat.items() if is_trainable(k, freeze_lm_embeddings)}
    frozen = {k: v for k, v in flat.items() if k not in train}
    return train, frozen


def merge_params(train: FlatParams, frozen: FlatParams) -> Any:
    return traverse_util.unflatten_dict({**frozen, **train})


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    if cfg.schedule == "constant":
        sched = optax.constant_schedule(cfg.learning_rate)
    elif cfg.schedule == "linear":
        sched = optax.linear_schedule(
            cfg.learning_rate, 0.0, cfg.total_steps - cfg.warmup_steps
        )
    elif cfg.schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.total_steps - cfg.warmup_steps
        )
    else:
        raise ValueError(cfg.schedule)
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    return optax.join_schedules([warmup, sched], [cfg.warmup_steps])


def embed_row_mask_transform(
    media_token_id: int, eoc_token_id: int
) -> optax.GradientTransformation:
    """Zero embedding-row gradients except the two added special tokens."""

    def init(params):
        return optax.EmptyState()

    def mask(path, g):
        if tuple(path[-2:]) == ("wte", "embedding"):
            rows = jnp.zeros((g.shape[0], 1), g.dtype)
            rows = rows.at[media_token_id].set(1.0)
            rows = rows.at[eoc_token_id].set(1.0)
            return g * rows
        return g

    def update(updates, state, params=None):
        # updates is the trainable flat dict: keys are path tuples
        return {k: mask(k, g) for k, g in updates.items()}, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    cfg: OptimizerConfig,
    *,
    media_token_id: Optional[int] = None,
    eoc_token_id: Optional[int] = None,
    mask_embedding_rows: bool = True,
) -> optax.GradientTransformation:
    """AdamW over the trainable flat dict (keys are path tuples)."""
    sched = make_schedule(cfg)

    def wd_mask(params):
        # decay only gated-xattn params (train.py:392-408); matches both
        # per-layer and scanned layouts
        return {k: ("xattn" in "/".join(k)) for k in params.keys()}

    chain = []
    if mask_embedding_rows and media_token_id is not None:
        chain.append(embed_row_mask_transform(media_token_id, eoc_token_id))
    chain += [
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        optax.scale_by_learning_rate(sched),
    ]
    return optax.chain(*chain)
