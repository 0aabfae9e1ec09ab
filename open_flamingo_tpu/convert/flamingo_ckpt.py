"""Released OpenFlamingo checkpoint (.pt, trainable-only) <-> our pytree.

The released checkpoint.pt files contain the trainable set only
(filter_state_dict_to_trainable, open_flamingo/train/train_utils.py:
299-333): perceiver.*, the gated xattn blocks, and any key with "embed"
in its name (input embeddings; untied output heads too). Crucially the
filter DELETES the duplicate `lang_encoder.gated_cross_attn_layers.*`
ModuleList aliases (train_utils.py:321-333), so released checkpoints
carry the xattn weights under the FlamingoLayer naming
(flamingo_lm.py:6-23, decoder-attr table factory.py:132-141):

  perceiver.latents
  perceiver.layers.{i}.0.{norm_media,norm_latents,to_q,to_kv,to_out}.*
  perceiver.layers.{i}.1.{0,1,3}.*           # FeedForward Sequential
  perceiver.norm.*
  lang_encoder.<decoder attr>.{i}.gated_cross_attn_layer.{attn_gate,ff_gate}
  lang_encoder.<decoder attr>.{i}.gated_cross_attn_layer.attn.{norm,to_q,to_kv,to_out}.*
  lang_encoder.<decoder attr>.{i}.gated_cross_attn_layer.ff.{0,1,3}.*
  lang_encoder.<family embedding path>.weight  # wte / embed_in / embed_tokens
  lang_encoder.embed_out.weight / lm_head.weight  # untied output head

We also accept the pre-filter ModuleList naming
(`lang_encoder.gated_cross_attn_layers.{i}.*`) for checkpoints saved
without the reference's filtering. The exporter emits the released
format (FlamingoLayer naming + per-family embedding key) so checkpoints
trained here load into the reference with load_state_dict(strict=False).
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
    # Two possible namings for the gated xattn blocks; in both, {i} is the
    # decoder-layer index (the ModuleList holds None at non-xattn positions,
    # flamingo_lm.py:95-104, so indices line up).
    xattn_prefixes: Dict[int, str] = {}
    for k in sd:
        m = re.match(r"(lang_encoder\.gated_cross_attn_layers\.(\d+))\.", k)
        if m:
            xattn_prefixes.setdefault(int(m.group(2)), m.group(1))
        m = re.match(r"(lang_encoder\.[\w.]+\.(\d+)\.gated_cross_attn_layer)\.", k)
        if m:
            xattn_prefixes.setdefault(int(m.group(2)), m.group(1))
    for i, p in sorted(xattn_prefixes.items()):
        lm[f"xattn_{i}"] = {
            "attn_gate": sd[f"{p}.attn_gate"],
            "ff_gate": sd[f"{p}.ff_gate"],
            "attn": _attn_from_torch(sd, f"{p}.attn"),
            "ff": _ff_from_torch(sd, f"{p}.ff"),
        }

    for k, v in sd.items():
        if "gated_cross_attn" in k or not k.startswith("lang_encoder."):
            continue
        if k.endswith(("wte.weight", "embed_in.weight", "embed_tokens.weight")):
            lm["wte"] = {"embedding": v}
        elif k.endswith(("embed_out.weight", "lm_head.weight")):
            # untied output head, kept by the reference filter ("embed" in
            # name / trainable); rows for <image>/<|endofchunk|> matter.
            lm["lm_head"] = {"kernel": _t(v)}

    if not lm and not perceiver:
        raise ValueError(
            "checkpoint contained no recognizable OpenFlamingo keys "
            f"(got e.g. {sorted(sd)[:5]})"
        )
    if perceiver and not any(k.startswith("xattn_") for k in lm):
        raise ValueError(
            "checkpoint has perceiver weights but no gated cross-attention "
            "weights were recognized — the model would silently run as an "
            f"unconditioned base LM. Keys seen: {sorted(sd)[:10]} ..."
        )
    return {"perceiver": perceiver, "lm": lm}


# Decoder-layer attr + embedding key paths per family, mirroring the
# reference's __KNOWN_DECODER_LAYERS_ATTR_NAMES (factory.py:132-141) and
# the HF module naming each family uses for its embeddings/head.
_FAMILY_PATHS = {
    "mpt": ("transformer.blocks", "transformer.wte.weight", None),
    "gptneox": ("gpt_neox.layers", "gpt_neox.embed_in.weight", "embed_out.weight"),
    "llama": ("model.layers", "model.embed_tokens.weight", "lm_head.weight"),
    "gptj": ("transformer.h", "transformer.wte.weight", "lm_head.weight"),
    "opt": (
        "model.decoder.layers",
        "model.decoder.embed_tokens.weight",
        "lm_head.weight",
    ),
}


def export_flamingo_checkpoint(
    params: Mapping[str, Any], family: str = "mpt"
) -> Dict[str, np.ndarray]:
    """Our trainable params tree -> released-checkpoint torch state_dict
    naming for `family` (so reference code can consume checkpoints trained
    here via load_state_dict(strict=False)): xattn under the FlamingoLayer
    path `lang_encoder.<decoder attr>.{i}.gated_cross_attn_layer.*` as the
    reference's filter_state_dict_to_trainable leaves them
    (train_utils.py:321-333), embeddings under the family's HF key."""
    layers_attr, embed_key, head_key = _FAMILY_PATHS[family]
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
        base = f"lang_encoder.{layers_attr}.{i}.gated_cross_attn_layer"
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
        put(f"lang_encoder.{embed_key}", lm["wte"]["embedding"])
    if "lm_head" in lm and head_key is not None:
        put(f"lang_encoder.{head_key}", lm["lm_head"]["kernel"], transpose=True)
    return sd
