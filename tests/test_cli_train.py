"""End-to-end train CLI smoke test: synthetic LAION+MMC4 shards -> tiny
model -> 2 epochs on the 8-device CPU mesh with checkpoint + auto-resume."""

import io
import json
import tarfile

import numpy as np
import pytest

from open_flamingo_tpu.image_processing import ImageProcessor
from open_flamingo_tpu.tokenization import SimpleTokenizer
from open_flamingo_tpu.train.cli import main

from test_data import _jpeg_bytes, _mmc4_doc, _write_laion_shard
from test_flamingo import tiny_flamingo

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'


def _write_mmc4_shard(path, rng, n=12):
    with tarfile.open(path, "w") as tf:
        for i in range(n):
            data = json.dumps(_mmc4_doc(rng)).encode()
            ti = tarfile.TarInfo(f"{i:06d}.json")
            ti.size = len(data)
            tf.addfile(ti, io.BytesIO(data))


def test_train_cli_end_to_end(tmp_path, rng):
    _write_laion_shard(tmp_path / "laion-0000.tar", rng, n=24)
    _write_mmc4_shard(tmp_path / "mmc4-0000.tar", rng, n=16)

    import jax

    model = tiny_flamingo()
    # tokenizer must produce ids matching tiny config's MEDIA/EOC ids;
    # build a vocab so "<image>"/"<|endofchunk|>" land anywhere and then
    # override the model cfg ids to match the tokenizer.
    tok = SimpleTokenizer(vocab_size=64)
    media_id = tok.encode("<image>")[-1]
    eoc_id = tok.encode("<|endofchunk|>")[-1]
    import dataclasses

    cfg = dataclasses.replace(
        model.cfg, media_token_id=media_id, eoc_token_id=eoc_id
    )
    from open_flamingo_tpu.models.flamingo import Flamingo

    model = Flamingo(cfg=cfg)
    proc = ImageProcessor(image_size=14)
    vision_x = np.zeros((1, 1, 1, 14, 14, 3), np.float32)
    ids = np.full((1, 4), media_id, np.int32)
    params = model.init(
        jax.random.PRNGKey(0), vision_x, ids, np.ones_like(ids)
    )

    run_dir = str(tmp_path / "run")
    argv = [
        "--laion_shards", str(tmp_path / "laion-0000.tar"),
        "--mmc4_shards", str(tmp_path / "mmc4-0000.tar"),
        "--batch_size_laion", "8",
        "--batch_size_mmc4", "4",
        "--train_num_samples_laion", "16",
        "--train_num_samples_mmc4", "8",
        "--num_epochs", "1",
        "--warmup_steps", "0",
        "--workers", "1",
        "--logging_steps", "1",
        "--run_name", run_dir,
        "--mesh_fsdp", "4",
        "--mesh_model", "2",
    ]
    state = main(argv, model_override=(model, params, proc, tok))
    assert int(state.step) >= 2

    # auto-resume: epoch 0 checkpoint exists, second run resumes past it
    state2 = main(
        argv[:-4] + ["--mesh_fsdp", "4", "--mesh_model", "2",
                     "--num_epochs", "2"],
        model_override=(model, params, proc, tok),
    )
    assert int(state2.step) >= int(state.step)
