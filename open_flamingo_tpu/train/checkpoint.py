"""Checkpoint save/resume via Orbax (sharded-native), plus auto-resume
discovery.

Replaces the reference's FSDP full-state-gather + torch pickle
(open_flamingo/train/train_utils.py:299-375, train.py:283-308): Orbax
writes each shard from its owning host — no rank-0 gather, no
_optim_utils.py patch. What is saved is exactly the reference's
"trainable-only" filtered set (train_utils.py:299-333): TrainState.params
already contains only perceiver / gated-xattn / embedding leaves.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import traverse_util

from .train_loop import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _to_savable(state: TrainState) -> Any:
    # orbax StandardCheckpointer wants string-keyed nested dicts
    return {
        "step": state.step,
        "params": traverse_util.unflatten_dict(state.params),
        "opt_state": state.opt_state,
    }


def save_checkpoint(
    run_dir: str, state: TrainState, epoch: int, keep_last: Optional[int] = None
) -> str:
    """Write {run_dir}/checkpoint_{epoch}; optionally delete older ones
    (the reference's delete_previous_checkpoint, train_utils.py:370-375)."""
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(run_dir, f"checkpoint_{epoch}"))
    ckpt = _checkpointer()
    ckpt.save(path, _to_savable(state), force=True)
    ckpt.wait_until_finished()
    if keep_last:
        for e in sorted(_list_epochs(run_dir))[:-keep_last]:
            import shutil

            shutil.rmtree(os.path.join(run_dir, f"checkpoint_{e}"))
    return path


def _list_epochs(run_dir: str):
    out = []
    for name in os.listdir(run_dir):
        m = re.fullmatch(r"checkpoint_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_checkpoint(run_dir: str) -> Optional[str]:
    """Auto-resume discovery (train.py:283-295)."""
    if not os.path.isdir(run_dir):
        return None
    epochs = _list_epochs(run_dir)
    if not epochs:
        return None
    return os.path.join(run_dir, f"checkpoint_{max(epochs)}")


def load_checkpoint(path: str, target_state: TrainState) -> TrainState:
    """Restore into the structure (and shardings) of target_state."""
    ckpt = _checkpointer()
    target = _to_savable(target_state)
    restored = ckpt.restore(os.path.abspath(path), target)

    # re-place on the target's shardings (orbax may restore single-device);
    # single-device targets become uncommitted arrays so jit under a mesh
    # can auto-place them.
    def place(r, t):
        if not hasattr(r, "shape"):
            return r
        if hasattr(t, "sharding") and len(t.sharding.device_set) > 1:
            return jax.device_put(r, t.sharding)
        import numpy as np

        return jnp.asarray(np.asarray(r))

    restored = jax.tree.map(place, restored, target)
    return TrainState(
        step=restored["step"],
        params=traverse_util.flatten_dict(restored["params"]),
        opt_state=restored["opt_state"],
    )


def checkpoint_epoch(path: str) -> int:
    m = re.search(r"checkpoint_(\d+)$", path)
    return int(m.group(1)) if m else -1
