"""Input-pipeline throughput benchmark.

Measures images/s through the LAION loader for each backend
(thread vs spawned processes) and preprocessing mode (host float32 vs
uint8 + on-device normalize). The bar (VERDICT round 1): the loader must
sustain >= 2x the train step's measured consumption rate per chip so the
input pipeline can feed a pod without starving the TPUs — the reference
gets this from torch DataLoader(num_workers=N, persistent_workers=True)
(open_flamingo/train/data.py:459-465).

Usage:
    python -m open_flamingo_tpu.scripts.bench_loader \
        [--workers N] [--batches N] [--image-size 224] [--source-size 448]

Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tarfile
import tempfile
import time

import numpy as np

from open_flamingo_tpu.image_processing import ImageProcessor
from open_flamingo_tpu.tokenization import SimpleTokenizer
from open_flamingo_tpu.train.data.laion import DataConfig, get_laion_dataset


def make_shards(root: str, n_shards: int, per_shard: int, source_size: int):
    from PIL import Image

    rng = np.random.default_rng(0)
    for s in range(n_shards):
        path = os.path.join(root, f"bench-{s:04d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                arr = rng.integers(
                    0, 255, size=(source_size, source_size, 3), dtype=np.uint8
                )
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                img = buf.getvalue()
                txt = f"a synthetic benchmark caption number {i}".encode()
                for ext, data in (("jpg", img), ("txt", txt)):
                    ti = tarfile.TarInfo(f"{s:04d}{i:06d}.{ext}")
                    ti.size = len(data)
                    tf.addfile(ti, io.BytesIO(data))
    return os.path.join(root, f"bench-{{0000..{n_shards - 1:04d}}}.tar")


def run(cfg: DataConfig, image_processor, tok, n_batches: int) -> float:
    info = get_laion_dataset(cfg, image_processor, tok)
    it = iter(info.dataloader)
    next(it)  # warm up (worker start, first shard open)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches - 1):
        b = next(it)
        n += b["input_ids"].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=max(1, (os.cpu_count() or 1)))
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--source-size", type=int, default=448)
    ap.add_argument("--train-consumption", type=float, default=163.0,
                    help="measured train images/s/chip to compare against")
    args = ap.parse_args()

    tok = SimpleTokenizer()
    with tempfile.TemporaryDirectory() as root:
        n_samples = args.batches * args.batch_size
        shards = make_shards(
            root, max(2, args.workers), (n_samples // max(2, args.workers)) + 1,
            args.source_size,
        )
        for backend in ("thread", "process"):
            for device_preprocess in (False, True):
                cfg = DataConfig(
                    shards=shards,
                    batch_size=args.batch_size,
                    train_num_samples=n_samples,
                    workers=args.workers,
                    shuffle_buffer_size=64,
                    loader_backend=backend,
                    device_preprocess=device_preprocess,
                )
                proc = ImageProcessor(
                    image_size=args.image_size, random_flip=True
                )
                ips = run(cfg, proc, tok, args.batches)
                print(json.dumps({
                    "metric": "loader_images_per_sec",
                    "value": round(ips, 1),
                    "unit": "images/s",
                    "backend": backend,
                    "device_preprocess": device_preprocess,
                    "workers": args.workers,
                    "vs_train_consumption": round(
                        ips / args.train_consumption, 2
                    ),
                }))


if __name__ == "__main__":
    main()
