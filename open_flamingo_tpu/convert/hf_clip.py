"""CLIP vision checkpoint -> VisionTransformer param pytree converters.

Supports HF CLIPVisionModel naming and open_clip VisionTransformer naming
(the reference's vision tower source, open_flamingo/src/factory.py:42-48).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from ..models.vit import VisionConfig
from .hf_lm import _linear, _ln, _t, to_numpy_state_dict


def vision_config_from_hf(hf_config) -> VisionConfig:
    return VisionConfig(
        image_size=hf_config.image_size,
        patch_size=hf_config.patch_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_act=hf_config.hidden_act,
        projection_dim=getattr(hf_config, "projection_dim", None),
    )


def _conv_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """Conv2d kernel (D, C, P, P) -> Dense kernel (P*P*C, D) matching the
    ViT's (ph, pw, c) patch feature order."""
    d, c, p, _ = w.shape
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0).reshape(p * p * c, d))


def convert_clip_vision_params(
    sd: Mapping[str, Any], cfg: VisionConfig
) -> Dict[str, Any]:
    sd = to_numpy_state_dict(sd)
    if any(k.startswith("visual.") or k == "positional_embedding" for k in sd):
        # open_clip full-CLIP state dict: keep only the visual tower
        if any(k.startswith("visual.") for k in sd):
            sd = {
                k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")
            }
        return _convert_open_clip(sd, cfg)
    return _convert_hf(sd, cfg)


def _maybe_proj(params, sd, key, transpose):
    """Visual projection (open_clip `visual.proj` is (D, proj); HF
    CLIPModel `visual_projection.weight` is nn.Linear (proj, D))."""
    if key in sd:
        w = np.asarray(sd[key])
        params["proj"] = _t(w) if transpose else w
    return params


def _convert_hf(sd, cfg):
    pre = (
        "vision_model."
        if "vision_model.embeddings.class_embedding" in sd
        else ""
    )
    params: Dict[str, Any] = {
        "class_embedding": sd[pre + "embeddings.class_embedding"],
        "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
        "patch_embed": {
            "kernel": _conv_to_patch_kernel(
                sd[pre + "embeddings.patch_embedding.weight"]
            )
        },
        "pre_layernorm": _ln(sd, pre + "pre_layrnorm"),  # HF misspelling
    }
    for i in range(cfg.num_layers):
        b = f"{pre}encoder.layers.{i}."
        params[f"blocks_{i}"] = {
            "layer_norm1": _ln(sd, b + "layer_norm1"),
            "q_proj": _linear(sd, b + "self_attn.q_proj"),
            "k_proj": _linear(sd, b + "self_attn.k_proj"),
            "v_proj": _linear(sd, b + "self_attn.v_proj"),
            "out_proj": _linear(sd, b + "self_attn.out_proj"),
            "layer_norm2": _ln(sd, b + "layer_norm2"),
            "fc1": _linear(sd, b + "mlp.fc1"),
            "fc2": _linear(sd, b + "mlp.fc2"),
        }
    if cfg.post_ln_tokens or "visual_projection.weight" in sd:
        params["post_layernorm"] = _ln(sd, pre + "post_layernorm")
    return _maybe_proj(params, sd, "visual_projection.weight", transpose=True)


def _convert_open_clip(sd, cfg):
    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "class_embedding": sd["class_embedding"],
        "position_embedding": sd["positional_embedding"],
        "patch_embed": {"kernel": _conv_to_patch_kernel(sd["conv1.weight"])},
        "pre_layernorm": _ln(sd, "ln_pre"),
    }
    for i in range(cfg.num_layers):
        b = f"transformer.resblocks.{i}."
        w_in = sd[b + "attn.in_proj_weight"]  # (3D, D) fused q|k|v
        b_in = sd[b + "attn.in_proj_bias"]
        qw, kw, vw = np.split(w_in, 3, axis=0)
        qb, kb, vb = np.split(b_in, 3, axis=0)
        params[f"blocks_{i}"] = {
            "layer_norm1": _ln(sd, b + "ln_1"),
            "q_proj": {"kernel": _t(qw), "bias": qb},
            "k_proj": {"kernel": _t(kw), "bias": kb},
            "v_proj": {"kernel": _t(vw), "bias": vb},
            "out_proj": _linear(sd, b + "attn.out_proj"),
            "layer_norm2": _ln(sd, b + "ln_2"),
            "fc1": _linear(sd, b + "mlp.c_fc"),
            "fc2": _linear(sd, b + "mlp.c_proj"),
        }
    if cfg.post_ln_tokens or "proj" in sd:
        params["post_layernorm"] = _ln(sd, "ln_post")
    return _maybe_proj(params, sd, "proj", transpose=False)
