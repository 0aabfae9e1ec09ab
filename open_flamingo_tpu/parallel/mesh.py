"""Device mesh construction.

TPU-native replacement for the reference's NCCL/process-group wiring
(open_flamingo/train/distributed.py, SURVEY.md §2.3): parallelism is a
single Mesh with axes

  replica — pure data parallelism; gradients reduced over DCN across
            slices (the reference's HYBRID_SHARD outer group)
  fsdp    — parameter/optimizer sharding over ICI (ZeRO-3 / FULL_SHARD)
  model   — tensor parallelism over ICI (9B sharded decode)

Batches are sharded over (replica, fsdp); XLA emits all-gathers /
reduce-scatters from the sharding annotations — there is no hand-written
collective code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("replica", "fsdp", "model")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    replica: int = 1
    fsdp: int = 1
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.replica * self.fsdp * self.model

    @staticmethod
    def for_devices(
        n: int, *, model: int = 1, replica: int = 1
    ) -> "MeshConfig":
        """Default layout: everything not spent on model/replica goes to
        fsdp."""
        assert n % (model * replica) == 0, (n, model, replica)
        return MeshConfig(replica=replica, fsdp=n // (model * replica), model=model)


def make_mesh(
    cfg: MeshConfig,
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    num_slices: int = 1,
) -> Mesh:
    """Build the (replica, fsdp, model) mesh.

    For multi-slice topologies (num_slices > 1) the replica axis is laid
    out across slices (DCN) and fsdp/model ride ICI within a slice —
    the mesh_utils hybrid helper handles physical ordering.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg.num_devices != n:
        raise ValueError(f"mesh needs {cfg.num_devices} devices, have {n}")

    if num_slices > 1:
        assert cfg.replica % num_slices == 0, (
            f"replica={cfg.replica} must be divisible by "
            f"num_slices={num_slices}: the DCN axis carries pure data "
            f"parallelism (HYBRID_SHARD outer group)"
        )
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(cfg.replica // num_slices, cfg.fsdp, cfg.model),
                dcn_mesh_shape=(num_slices, 1, 1),
                devices=devices,
            )
            dev_array = dev_array.reshape(cfg.replica, cfg.fsdp, cfg.model)
        except ValueError:
            # virtual/CPU devices carry no slice_index attribute; emulate
            # the hybrid layout: contiguous groups of n/num_slices devices
            # form a slice, the replica axis spans slices first.
            dev_array = (
                np.asarray(devices)
                .reshape(num_slices, cfg.replica // num_slices,
                         cfg.fsdp, cfg.model)
                .reshape(cfg.replica, cfg.fsdp, cfg.model)
            )
    else:
        dev_array = np.asarray(devices).reshape(cfg.replica, cfg.fsdp, cfg.model)
    return Mesh(dev_array, AXES)
