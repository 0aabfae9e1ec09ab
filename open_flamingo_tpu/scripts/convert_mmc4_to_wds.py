"""Convert raw MMC4 doc shards (.zip/.jsonl of docs) + downloaded images
into webdataset tars with base64 images embedded per doc json.

Capability parity with open_flamingo/scripts/convert_mmc4_to_wds.py:37-85
using the built-in pipeline (no webdataset/braceexpand deps). Docs whose
images are missing keep only the available ones; each output sample is
{key}.json with image_info[*].image_base64 filled in.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tarfile
import uuid
import zipfile

from ..train.data.wds import expand_urls


class ShardWriter:
    def __init__(self, pattern: str, max_count: int = 1000):
        self.pattern = pattern
        self.max_count = max_count
        self.index = 0
        self.count = 0
        self.tar = None

    def _next(self):
        if self.tar:
            self.tar.close()
        self.tar = tarfile.open(self.pattern % self.index, "w")
        self.index += 1
        self.count = 0

    def write(self, key: str, payload: bytes):
        if self.tar is None or self.count >= self.max_count:
            self._next()
        info = tarfile.TarInfo(f"{key}.json")
        info.size = len(payload)
        self.tar.addfile(info, io.BytesIO(payload))
        self.count += 1

    def close(self):
        if self.tar:
            self.tar.close()


def iter_docs(shard_path: str):
    if shard_path.endswith(".zip"):
        with zipfile.ZipFile(shard_path) as zf:
            with zf.open(zf.namelist()[0]) as f:
                for line in f:
                    yield json.loads(line)
    else:
        with open(shard_path) as f:
            for line in f:
                if line.strip():
                    yield json.loads(line)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", required=True)
    p.add_argument("--doc_shards", required=True,
                   help="brace pattern of .zip/.jsonl doc shards")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--num_files_per_shard", type=int, default=1000)
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    shards = expand_urls(args.doc_shards)
    sink = ShardWriter(
        os.path.join(args.output_dir, "%09d.tar"), args.num_files_per_shard
    )
    from PIL import Image

    for idx, shard in enumerate(shards):
        for doc in iter_docs(shard):
            kept = []
            for im in doc.get("image_info", []):
                path = os.path.join(args.image_dir, str(idx), im["image_name"])
                if not os.path.exists(path):
                    path = os.path.join(args.image_dir, im["image_name"])
                if not os.path.exists(path):
                    continue
                try:
                    img = Image.open(path).convert("RGB")
                    buf = io.BytesIO()
                    img.save(buf, format="JPEG")
                    im["image_base64"] = base64.b64encode(buf.getvalue()).decode()
                    kept.append(im)
                except Exception:
                    continue
            doc["image_info"] = kept
            sink.write(uuid.uuid4().hex, json.dumps(doc).encode())
    sink.close()


if __name__ == "__main__":
    main()
