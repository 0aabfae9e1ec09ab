"""Parameter/batch sharding rules over the (replica, fsdp, model) mesh.

Replaces the reference's FSDP double-wrap + requires_grad gymnastics
(open_flamingo/src/flamingo.py:202-301, train/train.py:310-366): sharding
is a pure function param-path -> PartitionSpec; frozen params are simply
absent from the optimizer pytree. Megatron-style tensor parallelism:
column-parallel in-projections (QKV/up/fc1), row-parallel out-projections
(out/down/fc2); embeddings vocab-sharded on `model`.

Axes that do not divide a dimension are dropped (falls back toward
replication) so the same rules serve 9B production configs and tiny test
models.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names (second-to-last path segment) -> sharding style
_COL_PARALLEL = {
    # out-features sharded on `model`, in-features on `fsdp`
    "Wqkv", "query_key_value", "q_proj", "k_proj", "v_proj",
    "gate_proj", "up_proj", "dense_h_to_4h", "fc1", "to_q", "to_kv",
}
_ROW_PARALLEL = {
    # in-features sharded on `model`, out-features on `fsdp`
    "out_proj", "o_proj", "dense", "down_proj", "dense_4h_to_h",
    "fc2", "to_out",
}


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return names


def _fit(spec: P, shape, mesh: Mesh) -> P:
    """Drop axes that don't divide the corresponding dimension."""
    out = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            out.append(None)
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        out.append(axis if dim % size == 0 and size > 1 else None)
    return P(*out)


def pspec_for(path, shape, mesh: Mesh) -> P:
    names = _path_names(path)
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""

    if len(shape) < 2:
        return P()  # biases, norms, gates: replicate

    if leaf == "kernel" and len(shape) > 2:
        # scan-stacked kernels (layer axis leading): shard the matmul dims
        base = pspec_for(path, shape[-2:], mesh)
        return P(*([None] * (len(shape) - 2)), *base)

    if parent == "wte" and leaf == "embedding":
        return _fit(P("model", "fsdp"), shape, mesh)
    if parent == "lm_head" and leaf == "kernel":
        return _fit(P("fsdp", "model"), shape, mesh)
    if parent == "patch_embed" and leaf == "kernel":
        return _fit(P(None, "fsdp"), shape, mesh)
    if leaf == "kernel" and parent in _COL_PARALLEL:
        return _fit(P("fsdp", "model"), shape, mesh)
    if leaf == "kernel" and parent in _ROW_PARALLEL:
        return _fit(P("model", "fsdp"), shape, mesh)
    if leaf in ("position_embedding", "latents", "embedding"):
        return _fit(P(None, "fsdp"), shape, mesh)
    if leaf == "kernel":
        return _fit(P(None, "fsdp"), shape, mesh)
    return P()


def param_pspecs(params: Any, mesh: Mesh) -> Any:
    """Pytree of PartitionSpec matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: pspec_for(path, x.shape, mesh), params
    )


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh according to the default rules."""
    specs = param_pspecs(params, mesh)
    return jax.device_put(
        params,
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda x: isinstance(x, P)),
    )


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Data sharded over both data axes (replica, fsdp) on dim 0."""
    return NamedSharding(mesh, P(("replica", "fsdp"), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
