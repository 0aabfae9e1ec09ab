"""Data-layer tests: brace expansion, tar sample grouping with error
tolerance, LAION/MMC4 pipelines (shapes, template, determinism, rejection
rules)."""

import base64
import io
import json
import tarfile

import numpy as np
import pytest

from open_flamingo_tpu.image_processing import ImageProcessor
from open_flamingo_tpu.tokenization import SimpleTokenizer
from open_flamingo_tpu.train.data import get_data
from open_flamingo_tpu.train.data.laion import DataConfig
from open_flamingo_tpu.train.data.mmc4 import (
    RejectSample,
    preprocess_interleaved,
)
from open_flamingo_tpu.train.data.wds import braceexpand, tar_samples


def _jpeg_bytes(rng, size=32):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _png_b64_large(rng, size=128):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    data = buf.getvalue()
    assert len(data) // 1000 > 10  # must pass the MIN_KB filter
    return base64.b64encode(data).decode()


def test_braceexpand():
    assert braceexpand("s-{0000..0002}.tar") == [
        "s-0000.tar", "s-0001.tar", "s-0002.tar",
    ]
    assert braceexpand("{a,b}/x{1..2}") == ["a/x1", "a/x2", "b/x1", "b/x2"]


def _write_laion_shard(path, rng, n=16):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            key = f"{i:06d}"
            img = _jpeg_bytes(rng)
            for ext, data in [("jpg", img), ("txt", f"caption {i}".encode())]:
                ti = tarfile.TarInfo(f"{key}.{ext}")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))


def test_tar_samples_grouping_and_tolerance(tmp_path, rng):
    p = tmp_path / "shard.tar"
    _write_laion_shard(p, rng, n=4)
    samples = list(tar_samples(str(p)))
    assert len(samples) == 4
    assert all("jpg" in s and "txt" in s for s in samples)
    # unreadable shard is swallowed
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"not a tar at all")
    assert list(tar_samples(str(bad))) == []


def test_laion_pipeline(tmp_path, rng):
    for i in range(2):
        _write_laion_shard(tmp_path / f"laion-{i:04d}.tar", rng)
    tok = SimpleTokenizer()
    media_id = tok.encode("<image>")[-1]
    cfg = DataConfig(
        shards=str(tmp_path / "laion-{0000..0001}.tar"),
        batch_size=4,
        train_num_samples=16,
        workers=2,
        shuffle_buffer_size=8,
    )
    proc = ImageProcessor(image_size=14, random_flip=True)
    info = get_data(cfg, proc, tok, "image_text")
    batches = list(info.dataloader)
    assert len(batches) == 4
    b = batches[0]
    assert b["vision_x"].shape == (4, 1, 1, 14, 14, 3)
    assert b["input_ids"].shape == (4, 32)
    # template: first token is <image>, <|endofchunk|> present
    eoc_id = tok.encode("<|endofchunk|>")[-1]
    assert (b["input_ids"][:, 0] == media_id).all()
    assert (b["input_ids"] == eoc_id).any(axis=1).all()


def _mmc4_doc(rng, n_images=2, n_sent=3, sim=None):
    return {
        "text_list": [f"sentence number {i}" for i in range(n_sent)],
        "image_info": [
            {"image_base64": _png_b64_large(rng)} for _ in range(n_images)
        ],
        "similarity_matrix": (
            sim if sim is not None
            else rng.uniform(0.3, 0.9, size=(n_images, n_sent)).tolist()
        ),
    }


def test_mmc4_pipeline(tmp_path, rng):
    docs = [_mmc4_doc(rng) for _ in range(12)]
    p = tmp_path / "mmc4-0000.tar"
    with tarfile.open(p, "w") as tf:
        for i, d in enumerate(docs):
            data = json.dumps(d).encode()
            ti = tarfile.TarInfo(f"{i:06d}.json")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    tok = SimpleTokenizer()
    cfg = DataConfig(
        shards=str(p), batch_size=2, train_num_samples=4, workers=1,
        shuffle_buffer_size=4,
    )
    proc = ImageProcessor(image_size=14)
    info = get_data(cfg, proc, tok, "mmc4")
    batches = list(info.dataloader)
    assert len(batches) == 2
    b = batches[0]
    assert b["vision_x"].shape == (2, 6, 1, 14, 14, 3)
    assert b["input_ids"].shape == (2, 256)
    media_id = tok.encode("<image>")[-1]
    assert (b["input_ids"] == media_id).sum() >= 2


def test_mmc4_assignment_and_rejection(rng):
    tok = SimpleTokenizer()
    media_id = tok.encode("<image>")[-1]
    proc = ImageProcessor(image_size=14)
    cfg = DataConfig(shards="x", mmc4_textsim_threshold=0.5)
    g = np.random.default_rng(0)

    # image 0 matches sentence 2 (0.9), image 1 below threshold everywhere
    sim = [[0.1, 0.2, 0.9], [0.1, 0.2, 0.3]]
    doc = _mmc4_doc(rng, n_images=2, n_sent=3, sim=sim)
    # single image remaining -> 50% drop; force-keep via rng patched to 0.9
    class KeepRng:
        def random(self):
            return 0.9
    vision, ids, mask = preprocess_interleaved(doc, cfg, proc, tok, media_id, KeepRng())
    assert (ids == media_id).sum() == 1
    # the <image> precedes the tokens of sentence 2 (decode drops
    # specials, so locate it by token id)
    pos = int(np.argmax(ids == media_id))
    # sentence 2 is "sentence number 2"
    two = tok.encode("2")[-1]
    assert two in ids[pos:pos + 5]

    # all below threshold -> reject
    sim = [[0.1, 0.2, 0.3], [0.1, 0.2, 0.3]]
    doc = _mmc4_doc(rng, n_images=2, n_sent=3, sim=sim)
    with pytest.raises(RejectSample):
        preprocess_interleaved(doc, cfg, proc, tok, media_id, KeepRng())

    # 50% single-image drop
    class DropRng:
        def random(self):
            return 0.3
    sim = [[0.1, 0.2, 0.9], [0.1, 0.2, 0.3]]
    doc = _mmc4_doc(rng, n_images=2, n_sent=3, sim=sim)
    with pytest.raises(RejectSample):
        preprocess_interleaved(doc, cfg, proc, tok, media_id, DropRng())


def test_process_loader_matches_thread_backend(tmp_path, rng):
    """The spawned-process backend must yield the same batches as the
    in-process thread backend for identical (seed, epoch)."""
    for i in range(2):
        _write_laion_shard(tmp_path / f"p-{i:04d}.tar", rng)
    tok = SimpleTokenizer()
    proc = ImageProcessor(image_size=14)
    mk = lambda backend: DataConfig(
        shards=str(tmp_path / "p-{0000..0001}.tar"), batch_size=4,
        train_num_samples=8, workers=1, shuffle_buffer_size=4,
        loader_backend=backend,
    )
    a = list(get_data(mk("thread"), proc, tok, "laion").dataloader)
    b = list(get_data(mk("process"), proc, tok, "laion").dataloader)
    assert len(a) == len(b) == 2
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])
        np.testing.assert_allclose(x["vision_x"], y["vision_x"], rtol=0, atol=0)


def _write_laion_shard_png(path, rng, n=8):
    """PNG shard: the device-preprocess path's libjpeg draft decode is a
    no-op for PNG, so pixels match the host path bit-for-bit."""
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for i in range(n):
            arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            img = buf.getvalue()
            for ext, data in [("png", img), ("txt", f"caption {i}".encode())]:
                ti = tarfile.TarInfo(f"{i:06d}.{ext}")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))


def test_device_preprocess_matches_host_path(tmp_path, rng):
    """uint8 batches + on-device normalization == the float32 host path
    (same pixels; normalize is the same arithmetic in fp32). PNG input:
    the jpeg draft-decode approximation doesn't apply."""
    import jax.numpy as jnp

    from open_flamingo_tpu.image_processing import normalize_images_on_device

    _write_laion_shard_png(tmp_path / "u-0000.tar", rng, n=8)
    tok = SimpleTokenizer()
    proc = ImageProcessor(image_size=14)
    mk = lambda dev: DataConfig(
        shards=str(tmp_path / "u-0000.tar"), batch_size=4,
        train_num_samples=4, workers=1, shuffle_buffer_size=4,
        device_preprocess=dev,
    )
    host = list(get_data(mk(False), proc, tok, "laion").dataloader)
    dev = list(get_data(mk(True), proc, tok, "laion").dataloader)
    for h, d in zip(host, dev):
        assert d["vision_x"].dtype == np.uint8
        np.testing.assert_array_equal(h["input_ids"], d["input_ids"])
        norm = np.asarray(
            normalize_images_on_device(jnp.asarray(d["vision_x"]), jnp.float32)
        )
        np.testing.assert_allclose(h["vision_x"], norm, atol=1e-6)


def test_mmc4_device_preprocess_uint8(tmp_path, rng):
    docs = [_mmc4_doc(rng) for _ in range(8)]
    p = tmp_path / "mmc4u-0000.tar"
    with tarfile.open(p, "w") as tf:
        for i, d in enumerate(docs):
            data = json.dumps(d).encode()
            ti = tarfile.TarInfo(f"{i:06d}.json")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))
    tok = SimpleTokenizer()
    cfg = DataConfig(
        shards=str(p), batch_size=2, train_num_samples=2, workers=1,
        shuffle_buffer_size=4, device_preprocess=True,
    )
    proc = ImageProcessor(image_size=14)
    batches = list(get_data(cfg, proc, tok, "mmc4").dataloader)
    assert batches and batches[0]["vision_x"].dtype == np.uint8
    assert batches[0]["vision_x"].shape == (2, 6, 1, 14, 14, 3)


def test_laion_determinism(tmp_path, rng):
    for i in range(2):
        _write_laion_shard(tmp_path / f"d-{i:04d}.tar", rng)
    tok = SimpleTokenizer()
    proc = ImageProcessor(image_size=14)
    cfg = DataConfig(
        shards=str(tmp_path / "d-{0000..0001}.tar"), batch_size=4,
        train_num_samples=8, workers=1, shuffle_buffer_size=4,
    )
    a = [b["input_ids"] for b in get_data(cfg, proc, tok, "laion").dataloader]
    b = [b["input_ids"] for b in get_data(cfg, proc, tok, "laion").dataloader]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epoch -> different order
    info = get_data(cfg, proc, tok, "laion", epoch=1)
    c = [b["input_ids"] for b in info.dataloader]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
