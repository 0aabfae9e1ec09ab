"""RICES: Retrieval-based In-Context Example Selection.

Parity with open_flamingo/eval/rices.py: a SEPARATE frozen CLIP encoder
(default ViT-B-32, rices.py:14) embeds the demo pool and queries with the
projected `encode_image` features (rices.py:58), unit-normalized; top-k
cosine retrieval returns the most-similar demos LAST (rices.py:65-95).
Precomputed features can be cached to disk
(scripts/cache_rices_features.py equivalent: save/load .npy).

Offline note: with no network, pass a local open_clip/HF checkpoint via
`vision_encoder_pretrained`; otherwise the encoder is random-init (same
retrieval mechanics, meaningless ordering) and a warning is printed.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RetrievalEncoder:
    """Frozen CLIP tower embedding images to unit-norm features.

    projected=True uses open_clip encode_image semantics
    (ln_post(CLS) @ proj); projected=False mean-pools patch tokens — a
    fallback for towers without a loaded projection head."""

    def __init__(self, model, params, image_processor, projected: bool = True):
        self.model = model
        self.params = params
        self.image_processor = image_processor
        self.projected = projected
        self._embed_jit = jax.jit(self._embed_raw)

    def _embed_raw(self, params, pixels):
        if self.projected:
            feats = self.model.apply(params, pixels, output="projected")
        else:
            tokens = self.model.apply(params, pixels)
            feats = jnp.mean(tokens, axis=1)
        feats = feats.astype(jnp.float32)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def embed(self, images_np: np.ndarray) -> np.ndarray:
        pixels = jnp.asarray(images_np, self.model.dtype)
        return np.asarray(self._embed_jit(self.params, pixels))

    def preprocess(self, image) -> np.ndarray:
        return np.asarray(self.image_processor(image), np.float32)


def create_retrieval_encoder(
    vision_encoder_path: str = "ViT-B-32",
    vision_encoder_pretrained: str = "openai",
    *,
    dtype=jnp.float32,
) -> RetrievalEncoder:
    """Build the RICES vision encoder (--rices_vision_encoder_path /
    --rices_vision_encoder_pretrained, reference evaluate.py:94-108).

    `vision_encoder_path` is a registry name (ViT-B-32 / ViT-L-14) or a
    local HF CLIP checkpoint dir; `vision_encoder_pretrained` is a local
    weights path (.pt state dict or HF dir) — "openai" means the upstream
    download, unavailable offline, so weights stay random-init."""
    from ..convert.hf_clip import convert_clip_vision_params
    from ..factory import _VISION_REGISTRY, _load_state_dict
    from ..image_processing import ImageProcessor
    from ..models.vit import VisionTransformer

    weights_src = None
    if vision_encoder_path in _VISION_REGISTRY:
        cfg = _VISION_REGISTRY[vision_encoder_path]
    elif os.path.isdir(vision_encoder_path):
        import transformers

        from ..convert.hf_clip import vision_config_from_hf

        hf_cfg = transformers.AutoConfig.from_pretrained(
            vision_encoder_path, local_files_only=True
        )
        hf_vis = getattr(hf_cfg, "vision_config", hf_cfg)
        if getattr(hf_vis, "projection_dim", None) is None and hasattr(
            hf_cfg, "projection_dim"
        ):
            hf_vis.projection_dim = hf_cfg.projection_dim
        cfg = vision_config_from_hf(hf_vis)
        weights_src = vision_encoder_path
    else:
        cfg = _VISION_REGISTRY["ViT-B-32"]

    model = VisionTransformer(cfg=cfg, dtype=dtype)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), dtype)
    params = model.init(jax.random.PRNGKey(0), dummy, output="projected")

    if vision_encoder_pretrained and vision_encoder_pretrained != "openai":
        weights_src = vision_encoder_pretrained
    if weights_src:
        sd = _load_clip_state_dict(weights_src)
        converted = convert_clip_vision_params(sd, cfg)
        params = {"params": _merge(dict(params["params"]), converted)}
    else:
        print(
            "RICES: no local weights for the retrieval encoder "
            f"({vision_encoder_path!r} pretrained={vision_encoder_pretrained!r})"
            " — using random init; retrieval ordering will not match the"
            " reference until weights are provided."
        )
    return RetrievalEncoder(
        model, params, ImageProcessor(image_size=cfg.image_size),
        projected=cfg.projection_dim is not None,
    )


def _load_clip_state_dict(path):
    if os.path.isdir(path):
        import transformers

        m = transformers.CLIPModel.from_pretrained(path, local_files_only=True)
        return m.state_dict()
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd)


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _merge(dict(dst.get(k, {})), v)
        else:
            out[k] = jnp.asarray(v)
    return out


class RICES:
    def __init__(
        self,
        dataset,
        encoder: RetrievalEncoder,
        batch_size: int = 32,
        cached_features: Optional[np.ndarray] = None,
    ):
        self.dataset = dataset
        self.encoder = encoder
        self.batch_size = batch_size
        if cached_features is not None:
            self.features = np.asarray(cached_features)
        else:
            self.features = self._precompute_features()

    def _precompute_features(self) -> np.ndarray:
        out = []
        batch = []
        for i in range(len(self.dataset)):
            batch.append(self.encoder.preprocess(self.dataset[i]["image"]))
            if len(batch) == self.batch_size or i == len(self.dataset) - 1:
                out.append(self.encoder.embed(np.stack(batch)))
                batch = []
        return np.concatenate(out, axis=0)

    def save_features(self, path: str):
        np.save(path, self.features)

    def find(self, batch_images: List, num_examples: int) -> List[list]:
        """Top-k demos per query image, most similar last (rices.py:65-95)."""
        q = np.stack([self.encoder.preprocess(im) for im in batch_images])
        qf = self.encoder.embed(q)  # (B, D)
        sim = qf @ self.features.T  # (B, N)
        order = np.argsort(-sim, axis=1)[:, :num_examples]
        return [
            [self.dataset[int(i)] for i in reversed(row)] for row in order
        ]
