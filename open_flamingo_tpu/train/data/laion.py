"""LAION (paired image-text) pipeline.

Semantics parity with open_flamingo/train/data.py:35-72,372-471:
shards -> samples -> filter no-caption/no-image -> decode RGB ->
CLIP preprocess (+ RandomHorizontalFlip(0.5)) -> text template
"<image>{caption}<|endofchunk|>{eos}" right-padded to 32 tokens ->
fixed-shape numpy batches (vision_x (B,1,1,H,W,C) NHWC).
"""

from __future__ import annotations

import dataclasses
import io
from typing import Any, List

import numpy as np

from .wds import (
    DataInfo,
    PrefetchLoader,
    SharedEpoch,
    batched,
    detshuffle,
    expand_urls,
    map_safe,
    resampled_shards,
    shards_to_samples,
    shuffle_buffer,
    split_shards,
)

IMAGE_EXTS = ("jpg", "png", "jpeg", "webp")


@dataclasses.dataclass
class DataConfig:
    shards: Any                      # url pattern(s) with brace ranges
    batch_size: int = 8
    train_num_samples: int = 10000
    seed: int = 42
    workers: int = 1
    host_id: int = 0
    num_hosts: int = 1
    dataset_resampled: bool = False
    shuffle_buffer_size: int = 5000
    max_tokens: int = 32
    # mmc4-only knobs (kept here so one config type serves both)
    mmc4_textsim_threshold: float = 0.24
    mmc4_min_num_images: int = 1
    mmc4_max_num_images: int = 6


def _has_caption(sample) -> bool:
    return "txt" in sample and any(e in sample for e in IMAGE_EXTS)


def make_sample_fn(cfg: DataConfig, image_processor, tokenizer, epoch: int):
    from PIL import Image

    rng = np.random.default_rng(cfg.seed + epoch * 1000 + cfg.host_id)

    def to_sample(raw):
        ext = next(e for e in IMAGE_EXTS if e in raw)
        img = Image.open(io.BytesIO(raw[ext])).convert("RGB")
        pixels = image_processor(img, rng)  # (H, W, C)
        caption = raw["txt"].decode("utf-8")
        text = f"<image>{caption}<|endofchunk|>{tokenizer.eos_token}"
        tokenizer.padding_side = "right"
        t = tokenizer(
            text,
            max_length=cfg.max_tokens,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        return (
            pixels.astype(np.float32),
            np.asarray(t["input_ids"]).reshape(-1).astype(np.int32),
            np.asarray(t["attention_mask"]).reshape(-1).astype(np.int32),
        )

    return to_sample


def collate_laion(samples: List[Any]):
    pixels = np.stack([s[0] for s in samples])  # (B, H, W, C)
    b, h, w, c = pixels.shape
    return {
        "vision_x": pixels.reshape(b, 1, 1, h, w, c),
        "input_ids": np.stack([s[1] for s in samples]),
        "attention_mask": np.stack([s[2] for s in samples]),
    }


def get_laion_dataset(
    cfg: DataConfig, image_processor, tokenizer, epoch: int = 0
) -> DataInfo:
    urls = expand_urls(cfg.shards)
    shared_epoch = SharedEpoch(epoch)
    num_batches = max(1, cfg.train_num_samples // (cfg.batch_size * cfg.num_hosts))

    def worker_iter(worker_id: int, ep: int):
        if cfg.dataset_resampled:
            shards = resampled_shards(urls, len(urls), cfg.seed, ep)
        else:
            shards = detshuffle(urls, cfg.seed, ep)
        shards = split_shards(
            shards, cfg.host_id, cfg.num_hosts, worker_id, cfg.workers
        )
        it = shards_to_samples(shards)
        it = (s for s in it if _has_caption(s))
        it = shuffle_buffer(
            it, cfg.shuffle_buffer_size, cfg.seed + ep + worker_id
        )
        it = map_safe(it, make_sample_fn(cfg, image_processor, tokenizer, ep))
        return batched(it, cfg.batch_size, collate_laion)

    loader = PrefetchLoader(
        worker_iter, cfg.workers, num_batches, shared_epoch
    )
    return DataInfo(dataloader=loader, shared_epoch=shared_epoch)
