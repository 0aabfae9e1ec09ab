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
    ProcessPrefetchLoader,
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
    # loader backend: "thread" (in-process) or "process" (spawned
    # workers, GIL-free decode — the reference's DataLoader(num_workers)
    # equivalent, open_flamingo/train/data.py:459-465)
    loader_backend: str = "thread"
    # emit uint8 pixels (host resize/crop only); the consumer normalizes
    # in-graph via image_processing.normalize_images_on_device
    device_preprocess: bool = False


def _has_caption(sample) -> bool:
    return "txt" in sample and any(e in sample for e in IMAGE_EXTS)


def make_sample_fn(cfg: DataConfig, image_processor, tokenizer, epoch: int):
    from PIL import Image

    rng = np.random.default_rng(cfg.seed + epoch * 1000 + cfg.host_id)

    def to_sample(raw):
        ext = next(e for e in IMAGE_EXTS if e in raw)
        img = Image.open(io.BytesIO(raw[ext]))
        if cfg.device_preprocess:
            # libjpeg DCT-scaled decode (~2x faster): result stays >= the
            # target in both dims, the bicubic resize then lands on the
            # exact size (training-only path; eval keeps full decode)
            img.draft("RGB", (cfg_image_size(image_processor),) * 2)
            img = img.convert("RGB")
            pixels = image_processor.raw_uint8(img, rng)  # (H, W, C) u8
        else:
            img = img.convert("RGB")
            pixels = image_processor(img, rng)  # (H, W, C) f32
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
            pixels if cfg.device_preprocess else pixels.astype(np.float32),
            np.asarray(t["input_ids"]).reshape(-1).astype(np.int32),
            np.asarray(t["attention_mask"]).reshape(-1).astype(np.int32),
        )

    return to_sample


def cfg_image_size(image_processor) -> int:
    return getattr(image_processor, "image_size", 224)


def collate_laion(samples: List[Any]):
    pixels = np.stack([s[0] for s in samples])  # (B, H, W, C)
    b, h, w, c = pixels.shape
    return {
        "vision_x": pixels.reshape(b, 1, 1, h, w, c),
        "input_ids": np.stack([s[1] for s in samples]),
        "attention_mask": np.stack([s[2] for s in samples]),
    }


def laion_worker_iter(
    worker_id: int, ep: int, cfg: DataConfig, image_processor, tokenizer
):
    """One worker's batch stream. Module-level (picklable) so it runs
    under both the thread and the spawned-process loader backends."""
    urls = expand_urls(cfg.shards)
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


def make_loader(cfg: DataConfig, worker_fn, worker_args, num_batches, shared_epoch):
    """Pick the loader backend (thread vs spawned processes)."""
    if cfg.loader_backend == "process":
        return ProcessPrefetchLoader(
            worker_fn, worker_args, cfg.workers, num_batches, shared_epoch
        )
    return PrefetchLoader(
        lambda wid, ep: worker_fn(wid, ep, *worker_args),
        cfg.workers, num_batches, shared_epoch,
    )


def get_laion_dataset(
    cfg: DataConfig, image_processor, tokenizer, epoch: int = 0
) -> DataInfo:
    shared_epoch = SharedEpoch(epoch)
    num_batches = max(1, cfg.train_num_samples // (cfg.batch_size * cfg.num_hosts))
    loader = make_loader(
        cfg, laion_worker_iter, (cfg, image_processor, tokenizer),
        num_batches, shared_epoch,
    )
    return DataInfo(dataloader=loader, shared_epoch=shared_epoch)
