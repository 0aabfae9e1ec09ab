"""Released OpenFlamingo checkpoint (.pt, trainable-only) <-> our pytree.

The released checkpoint.pt files contain the trainable set only
(filter_state_dict_to_trainable, open_flamingo/train/train_utils.py:
299-333): perceiver.*, lang_encoder.gated_cross_attn_layers.*, and the
input embeddings. Torch module naming (helpers.py/flamingo_lm.py):

  perceiver.latents
  perceiver.layers.{i}.0.{norm_media,norm_latents,to_q,to_kv,to_out}.*
  perceiver.layers.{i}.1.{0,1,3}.*           # FeedForward Sequential
  perceiver.norm.*
  lang_encoder.gated_cross_attn_layers.{i}.{attn_gate,ff_gate}
  lang_encoder.gated_cross_attn_layers.{i}.attn.{norm,to_q,to_kv,to_out}.*
  lang_encoder.gated_cross_attn_layers.{i}.ff.{0,1,3}.*
  lang_encoder.<family path>.wte.weight      # input embeddings

Also exports the reverse direction so checkpoints trained here can be
loaded by the reference implementation.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

from .hf_lm import _t, to_numpy_state_dict


def _ff_from_torch(sd: Mapping[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    # Sequential(LayerNorm, Linear, GELU, Linear)
    return {
        "norm": {
            "scale": sd[f"{prefix}.0.weight"],
            "bias": sd[f"{prefix}.0.bias"],
        },
        "fc1": {"kernel": _t(sd[f"{prefix}.1.weight"])},
        "fc2": {"kernel": _t(sd[f"{prefix}.3.weight"])},
    }


def _attn_from_torch(sd, prefix: str, norm_keys=("norm",)) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for nk in norm_keys:
        out[nk] = {
            "scale": sd[f"{prefix}.{nk}.weight"],
            "bias": sd[f"{prefix}.{nk}.bias"],
        }
    for lin in ("to_q", "to_kv", "to_out"):
        out[lin] = {"kernel": _t(sd[f"{prefix}.{lin}.weight"])}
    return out


def convert_flamingo_checkpoint(
    sd: Mapping[str, Any],
) -> Dict[str, Any]:
    """Reference checkpoint state_dict -> partial params tree to graft over
    {'perceiver': ..., 'lm': ...}. Handles 'module.'-prefixed keys
    (train.py:298-308 strips them too)."""
    sd = to_numpy_state_dict(sd)
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}

    perceiver: Dict[str, Any] = {}
    if "perceiver.latents" in sd:
        perceiver["latents"] = sd["perceiver.latents"]
    depth = 0
    while f"perceiver.layers.{depth}.0.to_q.weight" in sd:
        p = f"perceiver.layers.{depth}"
        perceiver[f"layers_{depth}_attn"] = _attn_from_torch(
            sd, f"{p}.0", norm_keys=("norm_media", "norm_latents")
        )
        perceiver[f"layers_{depth}_ff"] = _ff_from_torch(sd, f"{p}.1")
        depth += 1
    if "perceiver.norm.weight" in sd:
        perceiver["norm"] = {
            "scale": sd["perceiver.norm.weight"],
            "bias": sd["perceiver.norm.bias"],
        }

    lm: Dict[str, Any] = {}
    xattn_idx = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"lang_encoder\.gated_cross_attn_layers\.(\d+)\.", k))
        }
    )
    for i in xattn_idx:
        p = f"lang_encoder.gated_cross_attn_layers.{i}"
        lm[f"xattn_{i}"] = {
            "attn_gate": sd[f"{p}.attn_gate"],
            "ff_gate": sd[f"{p}.ff_gate"],
            "attn": _attn_from_torch(sd, f"{p}.attn"),
            "ff": _ff_from_torch(sd, f"{p}.ff"),
        }

    for k, v in sd.items():
        if k.startswith("lang_encoder.") and k.endswith("wte.weight"):
            lm["wte"] = {"embedding": v}
        if k.startswith("lang_encoder.") and k.endswith("embed_in.weight"):
            lm["wte"] = {"embedding": v}

    return {"perceiver": perceiver, "lm": lm}


def export_flamingo_checkpoint(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Our trainable params tree -> reference torch state_dict naming
    (so reference code can consume checkpoints trained here)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        arr = np.asarray(arr, np.float32)
        sd[name] = arr.T if transpose else arr

    per = p.get("perceiver", {})
    if "latents" in per:
        put("perceiver.latents", per["latents"])
    for key, val in per.items():
        m = re.fullmatch(r"layers_(\d+)_attn", key)
        if m:
            i = m.group(1)
            for nk in ("norm_media", "norm_latents"):
                put(f"perceiver.layers.{i}.0.{nk}.weight", val[nk]["scale"])
                put(f"perceiver.layers.{i}.0.{nk}.bias", val[nk]["bias"])
            for lin in ("to_q", "to_kv", "to_out"):
                put(
                    f"perceiver.layers.{i}.0.{lin}.weight",
                    val[lin]["kernel"], transpose=True,
                )
        m = re.fullmatch(r"layers_(\d+)_ff", key)
        if m:
            i = m.group(1)
            put(f"perceiver.layers.{i}.1.0.weight", val["norm"]["scale"])
            put(f"perceiver.layers.{i}.1.0.bias", val["norm"]["bias"])
            put(f"perceiver.layers.{i}.1.1.weight", val["fc1"]["kernel"], True)
            put(f"perceiver.layers.{i}.1.3.weight", val["fc2"]["kernel"], True)
    if "norm" in per:
        put("perceiver.norm.weight", per["norm"]["scale"])
        put("perceiver.norm.bias", per["norm"]["bias"])

    lm = p.get("lm", {})
    for key, val in lm.items():
        m = re.fullmatch(r"xattn_(\d+)", key)
        if not m:
            continue
        i = m.group(1)
        base = f"lang_encoder.gated_cross_attn_layers.{i}"
        put(f"{base}.attn_gate", val["attn_gate"])
        put(f"{base}.ff_gate", val["ff_gate"])
        put(f"{base}.attn.norm.weight", val["attn"]["norm"]["scale"])
        put(f"{base}.attn.norm.bias", val["attn"]["norm"]["bias"])
        for lin in ("to_q", "to_kv", "to_out"):
            put(f"{base}.attn.{lin}.weight", val["attn"][lin]["kernel"], True)
        put(f"{base}.ff.0.weight", val["ff"]["norm"]["scale"])
        put(f"{base}.ff.0.bias", val["ff"]["norm"]["bias"])
        put(f"{base}.ff.1.weight", val["ff"]["fc1"]["kernel"], True)
        put(f"{base}.ff.3.weight", val["ff"]["fc2"]["kernel"], True)
    if "wte" in lm:
        put("lang_encoder.transformer.wte.weight", lm["wte"]["embedding"])
    return sd
