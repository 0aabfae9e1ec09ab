"""RICES: Retrieval-based In-Context Example Selection.

Parity with open_flamingo/eval/rices.py: embed the demo pool with the
(frozen) CLIP vision tower, retrieve top-k cosine-similar demos per query,
returned most-similar LAST (rices.py:65-95). Uses our JAX ViT — features
are the mean-pooled penultimate patch tokens projected to unit norm;
precomputed features can be cached to disk
(scripts/cache_rices_features.py equivalent: save/load .npy)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RICES:
    def __init__(
        self,
        dataset,
        model,
        params,
        image_processor,
        batch_size: int = 32,
        cached_features: Optional[np.ndarray] = None,
    ):
        self.dataset = dataset
        self.model = model
        self.params = params
        self.image_processor = image_processor
        self.batch_size = batch_size
        if cached_features is not None:
            self.features = np.asarray(cached_features)
        else:
            self.features = self._precompute_features()

    def _embed(self, images_np: np.ndarray) -> np.ndarray:
        tokens = self.model.apply(
            self.params,
            jnp.asarray(images_np, self.model.dtype),
            method=lambda m, x: m.vision_encoder(x),
        )
        feats = jnp.mean(tokens.astype(jnp.float32), axis=1)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return np.asarray(feats)

    def _precompute_features(self) -> np.ndarray:
        out = []
        batch = []
        for i in range(len(self.dataset)):
            batch.append(np.asarray(self.image_processor(self.dataset[i]["image"])))
            if len(batch) == self.batch_size or i == len(self.dataset) - 1:
                out.append(self._embed(np.stack(batch)))
                batch = []
        return np.concatenate(out, axis=0)

    def save_features(self, path: str):
        np.save(path, self.features)

    def find(self, batch_images: List, num_examples: int) -> List[list]:
        """Top-k demos per query image, most similar last."""
        q = np.stack([np.asarray(self.image_processor(im)) for im in batch_images])
        qf = self._embed(q)  # (B, D)
        sim = qf @ self.features.T  # (B, N)
        order = np.argsort(-sim, axis=1)[:, :num_examples]
        return [
            [self.dataset[int(i)] for i in reversed(row)] for row in order
        ]
