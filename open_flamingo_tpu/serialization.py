"""Full-model save/load (serving checkpoints).

The training checkpointer (train/checkpoint.py) persists the trainable
state only, mirroring the reference's released .pt format. For serving /
redistribution this module saves the COMPLETE param pytree (frozen
backbones included) as an Orbax directory next to a json config, so a
model can be reloaded without re-running the HF converters.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax

from .models.decoders.common import DecoderConfig
from .models.flamingo import Flamingo, FlamingoConfig
from .models.vit import VisionConfig


def _cfg_to_dict(cfg: FlamingoConfig) -> dict:
    return {
        "vision": dataclasses.asdict(cfg.vision),
        "lm": dataclasses.asdict(cfg.lm),
        **{
            f.name: getattr(cfg, f.name)
            for f in dataclasses.fields(cfg)
            if f.name not in ("vision", "lm")
        },
    }


def _cfg_from_dict(d: dict) -> FlamingoConfig:
    d = dict(d)
    vision = VisionConfig(**d.pop("vision"))
    lm = DecoderConfig(**d.pop("lm"))
    return FlamingoConfig(vision=vision, lm=lm, **d)


def save_pretrained(path: str, model: Flamingo, params: Any) -> str:
    """Write {path}/config.json + {path}/params (Orbax, sharded-native)."""
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(_cfg_to_dict(model.cfg), f, indent=2)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(os.path.join(path, "params")), params, force=True)
    ckpt.wait_until_finished()
    return path


def load_pretrained(
    path: str,
    *,
    dtype: Any = None,
    param_dtype: Any = None,
    mesh=None,
) -> Tuple[Flamingo, Any]:
    """Load (model, params). With `mesh`, params restore directly onto the
    default sharding rules (no single-host materialization)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "config.json")) as f:
        cfg = _cfg_from_dict(json.load(f))
    model = Flamingo(
        cfg=cfg,
        dtype=dtype or jnp.float32,
        param_dtype=param_dtype or jnp.float32,
    )
    ckpt = ocp.StandardCheckpointer()
    params = ckpt.restore(os.path.abspath(os.path.join(path, "params")))
    if mesh is not None:
        from .parallel.sharding import shard_params

        params = shard_params(params, mesh)
    return model, params
