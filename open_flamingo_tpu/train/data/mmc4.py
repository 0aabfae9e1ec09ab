"""MMC4 (interleaved) pipeline.

Semantics parity with open_flamingo/train/data.py:136-369: per-doc json
with base64 images and a precomputed image x sentence similarity matrix;
bipartite assignment via scipy.optimize.linear_sum_assignment, threshold
filter, "<|endofchunk|><image>" insertion with first-eoc strip and
whitespace normalization, 256-token padding, zero-padding the image stack
to max_num_images, and the rejection rules (min images after truncation,
50% drop of single-image docs, single trailing <image>). ChatGPT-format
docs (is_gpt) use the _!_IMAGE{n}_!_ substitution variant
(data.py:75-135).
"""

from __future__ import annotations

import base64
import io
import json
from typing import Any, List

import numpy as np
from scipy.optimize import linear_sum_assignment

from .laion import DataConfig, make_loader
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

MIN_KB = 10
MMC4_MAX_TOKENS = 256


class RejectSample(ValueError):
    pass


def _decode_valid_images(image_info):
    from PIL import Image

    valid_images, valid_idx = [], []
    for i, im in enumerate(image_info):
        if "image_base64" not in im:
            continue
        raw = base64.b64decode(im["image_base64"])
        if len(raw) // 1000 <= MIN_KB:  # filter tiny images
            continue
        try:
            img = Image.open(io.BytesIO(raw)).convert("RGB")
        except Exception:
            continue
        valid_images.append(img)
        valid_idx.append(i)
    return valid_images, valid_idx


def _finalize(
    images: List[np.ndarray],
    text: str,
    cfg: DataConfig,
    tokenizer,
    media_token_id: int,
    rng: np.random.Generator,
):
    """Shared tail: pad image stack, tokenize, apply rejection rules."""
    max_n = cfg.mmc4_max_num_images
    images = images[:max_n]
    h, w, c = images[0].shape
    stack = np.zeros(
        (max_n, h, w, c),
        np.uint8 if cfg.device_preprocess else np.float32,
    )
    for i, im in enumerate(images):
        stack[i] = im

    tokenizer.padding_side = "right"
    t = tokenizer(
        text,
        max_length=MMC4_MAX_TOKENS,
        truncation=True,
        padding="max_length",
        return_tensors="np",
    )
    ids = np.asarray(t["input_ids"]).reshape(-1).astype(np.int32)
    mask = np.asarray(t["attention_mask"]).reshape(-1).astype(np.int32)

    num_images = int((ids == media_token_id).sum())
    if num_images < cfg.mmc4_min_num_images:
        raise RejectSample("too few images after truncation")
    if num_images == 1 and rng.random() <= 0.5:
        raise RejectSample("single-image sample dropped (50%)")
    if num_images == 1 and ids[-1] == media_token_id:
        raise RejectSample("single trailing <image>: labels would be all -100")

    return stack.reshape(max_n, 1, h, w, c), ids, mask


def _proc_image(image_processor, img, rng, cfg: DataConfig):
    if cfg.device_preprocess:
        return image_processor.raw_uint8(img, rng)
    return image_processor(img, rng)


def preprocess_interleaved(
    info: dict,
    cfg: DataConfig,
    image_processor,
    tokenizer,
    media_token_id: int,
    rng: np.random.Generator,
):
    if "is_gpt" in info:
        return preprocess_gpt_interleaved(
            info, cfg, image_processor, tokenizer, media_token_id, rng
        )

    sentences = list(info["text_list"])
    valid_images, valid_idx = _decode_valid_images(info["image_info"])
    if not valid_idx:
        raise RejectSample("no images in sample")

    sim = np.asarray(info["similarity_matrix"], np.float32)[valid_idx]
    img_ix, sent_ix = linear_sum_assignment(-sim)  # maximize similarity

    images, sentence_ixs = [], []
    for i, s in zip(img_ix, sent_ix):
        if sim[i][s] < cfg.mmc4_textsim_threshold:
            continue
        images.append(_proc_image(image_processor, valid_images[i], rng, cfg))
        sentence_ixs.append(s)
    if not images:
        raise RejectSample("no image above similarity threshold")

    keep = min(len(images), cfg.mmc4_max_num_images)
    images, sentence_ixs = images[:keep], sentence_ixs[:keep]

    for ix in sentence_ixs:
        sentences[ix] = f"<|endofchunk|><image>{sentences[ix]}"
    text = " ".join(sentences)
    text = text.replace("<|endofchunk|>", "", 1)
    text = (
        text.replace(" <|endofchunk|>", "<|endofchunk|>")
        .replace("<image> ", "<image>")
        .replace(" <image>", "<image>")
    )
    text = f"{text}<|endofchunk|>{tokenizer.eos_token}"
    return _finalize(images, text, cfg, tokenizer, media_token_id, rng)


def preprocess_gpt_interleaved(
    info: dict,
    cfg: DataConfig,
    image_processor,
    tokenizer,
    media_token_id: int,
    rng: np.random.Generator,
):
    """ChatGPT-sequence variant (data.py:75-135): images referenced inline
    as _!_IMAGE{n}_!_ placeholders."""
    text = info["text"]
    img_infos = info["image_info"]
    images = []
    for n, im in enumerate(img_infos, start=1):
        ph = f"_!_IMAGE{n}_!_"
        if ph not in text:
            continue
        raw = base64.b64decode(im["image_base64"])
        from PIL import Image

        img = Image.open(io.BytesIO(raw)).convert("RGB")
        images.append(_proc_image(image_processor, img, rng, cfg))
        text = text.replace(ph, "<|endofchunk|><image>")
    if not images:
        raise RejectSample("no images in gpt sample")

    text = text.replace("<|endofchunk|>", "", 1)
    text = (
        text.replace(" <|endofchunk|>", "<|endofchunk|>")
        .replace("<image> ", "<image>")
        .replace(" <image>", "<image>")
    )
    text = f"{text}<|endofchunk|>{tokenizer.eos_token}"
    return _finalize(images, text, cfg, tokenizer, media_token_id, rng)


def collate_mmc4(samples: List[Any]):
    return {
        "vision_x": np.stack([s[0] for s in samples]),  # (B, T_img, 1, H, W, C)
        "input_ids": np.stack([s[1] for s in samples]),
        "attention_mask": np.stack([s[2] for s in samples]),
    }


def mmc4_worker_iter(
    worker_id: int, ep: int, cfg: DataConfig, image_processor, tokenizer,
    media_token_id: int,
):
    """One worker's batch stream (module-level: picklable for the
    process loader backend)."""
    urls = expand_urls(cfg.shards)
    if cfg.dataset_resampled:
        shards = resampled_shards(urls, len(urls), cfg.seed, ep)
    else:
        shards = detshuffle(urls, cfg.seed, ep)
    shards = split_shards(
        shards, cfg.host_id, cfg.num_hosts, worker_id, cfg.workers
    )
    rng = np.random.default_rng(cfg.seed + ep * 1000 + worker_id)

    def proc(sample):
        info = json.loads(sample["json"])
        return preprocess_interleaved(
            info, cfg, image_processor, tokenizer, media_token_id, rng
        )

    it = shards_to_samples(shards)
    it = (s for s in it if "json" in s)
    it = shuffle_buffer(it, cfg.shuffle_buffer_size, cfg.seed + ep + worker_id)
    it = map_safe(it, proc)
    return batched(it, cfg.batch_size, collate_mmc4)


def get_mmc4_dataset(
    cfg: DataConfig, image_processor, tokenizer, epoch: int = 0,
    media_token_id: int = None,
) -> DataInfo:
    if media_token_id is None:
        media_token_id = tokenizer.encode("<image>")[-1]
    shared_epoch = SharedEpoch(epoch)
    num_batches = max(1, cfg.train_num_samples // (cfg.batch_size * cfg.num_hosts))
    loader = make_loader(
        cfg, mmc4_worker_iter,
        (cfg, image_processor, tokenizer, media_token_id),
        num_batches, shared_epoch,
    )
    return DataInfo(dataloader=loader, shared_epoch=shared_epoch)
