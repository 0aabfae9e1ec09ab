"""Multi-host bootstrap.

Replaces open_flamingo/train/distributed.py (env scraping for torchrun/
SLURM/MPI + NCCL init): on TPU pods jax.distributed.initialize()
autodetects the topology from the TPU metadata; explicit coordinator
env vars are honored for CPU/GPU fleets. Eval's all_gather_object
(evaluate.py:862) maps to process_allgather here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def world_info_from_env():
    """Mirror of distributed.py:48-70: derive (local_rank, rank, world_size)
    from common launcher env vars when present."""
    local_rank = int(
        os.environ.get("LOCAL_RANK")
        or os.environ.get("SLURM_LOCALID")
        or os.environ.get("OMPI_COMM_WORLD_LOCAL_RANK")
        or 0
    )
    rank = int(
        os.environ.get("RANK")
        or os.environ.get("SLURM_PROCID")
        or os.environ.get("PMI_RANK")
        or os.environ.get("OMPI_COMM_WORLD_RANK")
        or 0
    )
    world_size = int(
        os.environ.get("WORLD_SIZE")
        or os.environ.get("SLURM_NTASKS")
        or os.environ.get("PMI_SIZE")
        or os.environ.get("OMPI_COMM_WORLD_SIZE")
        or 1
    )
    return local_rank, rank, world_size


def init_distributed_device(
    coordinator_address: Optional[str] = None,
) -> dict:
    """Initialize multi-host JAX when running under a launcher; no-op for
    single-process. Returns {rank, world_size, local_devices}."""
    _, rank, world_size = world_info_from_env()
    if world_size > 1 and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("MASTER_ADDR", "") + ":" + os.environ.get("MASTER_PORT", "1234"),
            num_processes=world_size,
            process_id=rank,
        )
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_devices(),
    }


def process_allgather(obj: Any):
    """Gather host-local python objects across processes (the eval
    harness's dist.all_gather_object equivalent)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(obj, tiled=False))


def is_primary() -> bool:
    return jax.process_index() == 0
