"""CLIP image preprocessing.

Replaces the open_clip transform pipeline the reference gets from
open_clip.create_model_and_transforms (open_flamingo/src/factory.py:42-48):
resize shorter side (bicubic) -> center crop -> scale to [0,1] ->
normalize with the OpenAI CLIP statistics. Two paths:

  * host path (PIL, bit-faithful to torchvision for eval parity — PIL
    bicubic resize differs from XLA resize enough to shift CIDEr,
    SURVEY.md §7 hard part (c));
  * on-device path (pure XLA ops on uint8 batches) for training
    throughput — resize+crop+normalize fuse into the input pipeline.

Outputs NHWC float32/bf16 (TPU-native layout).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Union

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass
class ImageProcessor:
    """Host-side (PIL) CLIP transform; call on a PIL image or iterable.

    random_flip mirrors the reference's training-time
    RandomHorizontalFlip(0.5) (open_flamingo/train/data.py:35-44).
    """

    image_size: int = 224
    mean: Sequence[float] = CLIP_MEAN
    std: Sequence[float] = CLIP_STD
    random_flip: bool = False

    def __call__(self, image, rng: Union[np.random.Generator, None] = None):
        arr = self.raw_uint8(image, rng).astype(np.float32) / 255.0
        arr = (arr - np.asarray(self.mean, np.float32)) / np.asarray(
            self.std, np.float32
        )
        return np.ascontiguousarray(arr)  # (H, W, C)

    def raw_uint8(self, image, rng: Union[np.random.Generator, None] = None):
        """Resize + center-crop + flip only — uint8 (H, W, C) output.

        The device-preprocess input path ships these raw bytes to the
        chip (4x less host->device traffic than float32) and normalizes
        in-graph via normalize_images_on_device."""
        from PIL import Image

        if isinstance(image, (list, tuple)):
            return np.stack([self.raw_uint8(im, rng) for im in image])

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        image = image.convert("RGB")

        # torchvision Resize(size=int): shorter side -> size, bicubic
        w, h = image.size
        s = self.image_size
        if w < h:
            nw, nh = s, max(s, int(round(h * s / w)))
        else:
            nw, nh = max(s, int(round(w * s / h))), s
        image = image.resize((nw, nh), Image.BICUBIC)

        # center crop
        left = (nw - s) // 2
        top = (nh - s) // 2
        image = image.crop((left, top, left + s, top + s))

        arr = np.asarray(image, np.uint8)
        if self.random_flip:
            r = (rng or np.random.default_rng()).random()
            if r < 0.5:
                arr = arr[:, ::-1]
        return np.ascontiguousarray(arr)


def normalize_images_on_device(images_uint8, dtype=None):
    """XLA path for host-resized uint8 batches: (..., H, W, 3) uint8 ->
    normalized dtype. The inverse host half lives in
    ImageProcessor.raw_uint8; together they split CLIP preprocessing as
    decode/resize (host, processes) + convert/normalize (device, fused).
    Matches ImageProcessor.__call__ bit-for-bit in float32."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def preprocess_images_on_device(
    images_uint8,
    image_size: int = 224,
    dtype=None,
):
    """XLA path: (B, H, W, 3) uint8 -> (B, S, S, 3) normalized.

    Resize shorter side with bicubic jax.image.resize, center crop,
    normalize. Meant to be fused into a jitted input stage.
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    b, h, w, c = images_uint8.shape
    s = image_size
    x = images_uint8.astype(jnp.float32) / 255.0

    if w < h:
        nw, nh = s, max(s, int(round(h * s / w)))
    else:
        nw, nh = max(s, int(round(w * s / h))), s
    x = jax.image.resize(x, (b, nh, nw, c), method="bicubic")
    top, left = (nh - s) // 2, (nw - s) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, s, s, c))
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)
