"""Eval harness tests: rank classification vs brute force, generation
adapter, and end-to-end evaluators on synthetic datasets."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.eval.eval_model import OpenFlamingoEvalModel
from open_flamingo_tpu.eval.evaluate import (
    evaluate_captioning,
    evaluate_classification,
    evaluate_vqa,
)
from open_flamingo_tpu.image_processing import ImageProcessor
from open_flamingo_tpu.tokenization import SimpleTokenizer

from test_flamingo import tiny_flamingo

IMG = 14


@pytest.fixture(scope="module")
def eval_setup():
    import dataclasses

    from open_flamingo_tpu.models.flamingo import Flamingo

    tok = SimpleTokenizer(vocab_size=64)
    media_id = tok.encode("<image>")[-1]
    eoc_id = tok.encode("<|endofchunk|>")[-1]
    base = tiny_flamingo()
    cfg = dataclasses.replace(
        base.cfg, media_token_id=media_id, eoc_token_id=eoc_id
    )
    model = Flamingo(cfg=cfg)
    vision_x = np.zeros((1, 1, 1, IMG, IMG, 3), np.float32)
    ids = np.full((1, 4), media_id, np.int32)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, np.ones_like(ids))
    proc = ImageProcessor(image_size=IMG)
    em = OpenFlamingoEvalModel(model, params, proc, tok)
    return em, tok


def _pil_image(rng):
    from PIL import Image

    return Image.fromarray(
        rng.integers(0, 255, size=(20, 24, 3), dtype=np.uint8)
    )


def test_get_outputs_shapes(eval_setup, rng):
    em, tok = eval_setup
    texts = [
        em.get_caption_prompt("a demo") + em.get_caption_prompt(),
        em.get_caption_prompt(),
    ]
    images = [[_pil_image(rng), _pil_image(rng)], [_pil_image(rng)]]
    out = em.get_outputs(texts, images, 0, 4, num_beams=1, length_penalty=0.0)
    assert len(out) == 2
    assert all(isinstance(s, str) for s in out)


def test_rank_classification_matches_bruteforce(eval_setup, rng):
    em, tok = eval_setup
    model, params = em.model, em.params
    classes = ["cat", "dog house", "green bird"]
    texts = [em.get_imagenet_prompt(), em.get_imagenet_prompt()]
    images = [[_pil_image(rng)], [_pil_image(rng)]]

    scores = em.get_rank_classifications(
        texts, images, classes, use_cache=True, normalize_length=True,
        class_chunk=2,
    )
    assert scores.shape == (2, 3)

    # brute force: full forward on ctx+class, sum logprobs of class tokens
    vision_x = em._prepare_images(images)
    for ci, cname in enumerate(classes):
        ctoks = tok.encode(cname)
        for bi in range(2):
            em.tokenizer.padding_side = "left"
            t = tok(texts[bi: bi + 1], padding="longest", return_tensors="np")
            ids = np.concatenate(
                [t["input_ids"], np.asarray([ctoks], np.int32)], axis=1
            )
            mask = np.concatenate(
                [t["attention_mask"], np.ones((1, len(ctoks)), np.int32)], axis=1
            )
            logits, _, _ = model.apply(
                params,
                vision_x[bi: bi + 1],
                jnp.asarray(ids),
                jnp.asarray(mask),
            )
            logp = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
            t_ctx = t["input_ids"].shape[1]
            want = 0.0
            for j, ct in enumerate(ctoks):
                want += logp[0, t_ctx - 1 + j, ct]
            want /= len(ctoks)
            np.testing.assert_allclose(scores[bi, ci], want, atol=2e-4)


def test_rank_classification_nocache_matches_cached(eval_setup, rng):
    """--no_caching_for_classification path must score identically to the
    cached path (reference evaluate.py:79,658)."""
    em, _ = eval_setup
    classes = ["cat", "dog house", "green bird"]
    texts = [em.get_imagenet_prompt(), em.get_imagenet_prompt()]
    images = [[_pil_image(rng)], [_pil_image(rng)]]
    cached = em.get_rank_classifications(
        texts, images, classes, use_cache=True, normalize_length=True,
        class_chunk=2,
    )
    nocache = em.get_rank_classifications(
        texts, images, classes, use_cache=False, normalize_length=True,
        class_chunk=2,
    )
    np.testing.assert_allclose(nocache, cached, atol=2e-4)
    # and with sum (normalize_length=False) too
    cached_s = em.get_rank_classifications(
        texts, images, classes, use_cache=True, normalize_length=False,
    )
    nocache_s = em.get_rank_classifications(
        texts, images, classes, use_cache=False, normalize_length=False,
    )
    np.testing.assert_allclose(nocache_s, cached_s, atol=2e-4)


def _make_caption_data(tmp_path, rng, n_train=8, n_test=4):
    import os

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir, exist_ok=True)
    images = []
    words = ["dog", "cat", "bird", "fish", "tree", "car"]
    for i in range(n_train + n_test):
        p = img_dir / f"img_{i}.jpg"
        _pil_image(rng).save(p)
        images.append(
            {
                "filepath": "train2014",
                "filename": f"img_{i}.jpg",
                "cocoid": i,
                "split": "train" if i < n_train else "val",
                "sentences": [
                    {"raw": f"a {words[i % len(words)]} in a photo"},
                    {"raw": f"the {words[i % len(words)]} is shown"},
                ],
            }
        )
    ann = tmp_path / "karpathy.json"
    ann.write_text(json.dumps({"images": images}))
    return str(img_dir), str(ann)


def test_evaluate_captioning_end_to_end(eval_setup, tmp_path, rng):
    from open_flamingo_tpu.eval.eval_datasets import CaptionDataset

    em, _ = eval_setup
    img_dir, ann = _make_caption_data(tmp_path, rng)
    train = CaptionDataset(img_dir, ann, True, "coco", img_dir)
    test = CaptionDataset(img_dir, ann, False, "coco", img_dir)
    score = evaluate_captioning(
        em, train, test, num_shots=2, batch_size=2, num_samples=4,
        query_set_size=8, max_generation_length=4, num_beams=1,
    )
    assert score is not None and np.isfinite(score)


def test_evaluate_vqa_end_to_end(eval_setup, tmp_path, rng):
    import os

    from open_flamingo_tpu.eval.eval_datasets import VQADataset

    em, _ = eval_setup
    img_dir = tmp_path / "vqa_imgs"
    os.makedirs(img_dir)
    questions, annotations = [], []
    for i in range(8):
        split = "train2014" if i < 4 else "val2014"
        _pil_image(rng).save(img_dir / f"COCO_{split}_{i:012d}.jpg")
        questions.append(
            {"question": f"what is {i}", "question_id": i, "image_id": i}
        )
        annotations.append(
            {
                "question_id": i,
                "answers": [{"answer": "yes"}] * 10,
            }
        )
    qp = tmp_path / "q.json"
    ap = tmp_path / "a.json"
    qp.write_text(json.dumps({"questions": questions[:4]}))
    (tmp_path / "qt.json").write_text(json.dumps({"questions": questions[4:]}))
    ap.write_text(json.dumps({"annotations": annotations[:4]}))
    (tmp_path / "at.json").write_text(json.dumps({"annotations": annotations[4:]}))

    train = VQADataset(str(img_dir), str(qp), str(ap), True, "vqav2")
    test = VQADataset(
        str(img_dir), str(tmp_path / "qt.json"), str(tmp_path / "at.json"),
        False, "vqav2",
    )
    score = evaluate_vqa(
        em, train, test, num_shots=2, batch_size=2, num_samples=4,
        query_set_size=4, max_generation_length=3, num_beams=1,
    )
    assert score is not None and 0 <= score <= 100


def test_evaluate_classification_end_to_end(eval_setup, tmp_path, rng):
    em, _ = eval_setup

    class ToyDataset:
        def __init__(self, n):
            self.items = [
                {
                    "id": i,
                    "image": _pil_image(rng),
                    "class_id": i % 2,
                    "class_name": ["no", "yes"][i % 2],
                }
                for i in range(n)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    score = evaluate_classification(
        em, ToyDataset(6), ToyDataset(4),
        all_class_names=["no", "yes"],
        class_id_to_name={0: "no", 1: "yes"},
        prompt_fn=lambda item, label: em.get_hateful_memes_prompt(
            "some text", label
        ),
        num_shots=2, batch_size=2, num_samples=4, query_set_size=6,
        metric="roc_auc",
    )
    assert score is not None and np.isfinite(score)


# --- demo-latent cache -------------------------------------------------------


def _cached_eval_model(eval_setup):
    em, tok = eval_setup
    return OpenFlamingoEvalModel(
        em.model, em.params, em.image_processor, em.tokenizer,
        cache_media_latents=True, media_encode_chunk=4,
    ), tok


def test_demo_latent_cache_matches_direct(eval_setup, rng):
    """Cached-latent generate == direct vision_x generate (same images),
    and repeated images are encoded exactly once."""
    em, tok = eval_setup
    emc, _ = _cached_eval_model(eval_setup)
    demo = _pil_image(rng)
    texts = [
        em.get_caption_prompt("a demo") + em.get_caption_prompt(),
        em.get_caption_prompt("a demo") + em.get_caption_prompt(),
    ]
    images = [[demo, _pil_image(rng)], [demo, _pil_image(rng)]]
    want = em.get_outputs(texts, images, 0, 4, num_beams=1,
                          length_penalty=0.0)
    got = emc.get_outputs(texts, images, 0, 4, num_beams=1,
                          length_penalty=0.0)
    assert got == want
    # 3 unique images (demo shared) + the pad-slot zero image is absent
    # here (both rows full) -> 3 cache entries
    assert len(emc._latents_cache) == 3
    # second call with the same images: all hits, no new entries
    emc.get_outputs(texts, images, 0, 4, num_beams=1, length_penalty=0.0)
    assert len(emc._latents_cache) == 3


def test_demo_latent_cache_latents_match_embed_vision(eval_setup, rng):
    """Per-image cached latents == Flamingo.embed_vision on the batch."""
    from open_flamingo_tpu.models.flamingo import Flamingo

    emc, _ = _cached_eval_model(eval_setup)
    images = [[_pil_image(rng)], [_pil_image(rng)]]
    got = np.asarray(emc._media_latents(images), np.float32)
    vx = emc._prepare_images(images)
    want = np.asarray(emc.model.apply(
        emc.params, vx, method=Flamingo.embed_vision
    ), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_demo_latent_cache_ragged_rows(eval_setup, rng):
    """Rows with fewer images: pad slots use the zero image's latents
    (identical to _prepare_images' zero padding)."""
    emc, _ = _cached_eval_model(eval_setup)
    em, _ = eval_setup
    texts = [
        em.get_caption_prompt("a demo") + em.get_caption_prompt(),
        em.get_caption_prompt(),
    ]
    images = [[_pil_image(rng), _pil_image(rng)], [_pil_image(rng)]]
    want = em.get_outputs(texts, images, 0, 4, num_beams=1,
                          length_penalty=0.0)
    got = emc.get_outputs(texts, images, 0, 4, num_beams=1,
                          length_penalty=0.0)
    assert got == want


def test_demo_latent_cache_rank_classification(eval_setup, rng):
    emc, _ = _cached_eval_model(eval_setup)
    em, _ = eval_setup
    texts = [em.get_imagenet_prompt()]
    images = [[_pil_image(rng)]]
    names = ["cat", "dog", "fish"]
    want = em.get_rank_classifications(texts, images, names)
    got = emc.get_rank_classifications(texts, images, names)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_demo_latent_cache_lru_eviction(eval_setup, rng):
    emc, _ = _cached_eval_model(eval_setup)
    emc.media_latents_cache_size = 2
    em, _ = eval_setup
    texts = [em.get_caption_prompt()] * 1
    imgs = [_pil_image(rng) for _ in range(4)]
    for im in imgs:
        emc.get_outputs([em.get_caption_prompt()], [[im]], 0, 2,
                        num_beams=1, length_penalty=0.0)
    assert len(emc._latents_cache) == 2
    # most-recent two survive
    out = em.get_outputs([em.get_caption_prompt()], [[imgs[-1]]], 0, 2,
                         num_beams=1, length_penalty=0.0)
    got = emc.get_outputs([em.get_caption_prompt()], [[imgs[-1]]], 0, 2,
                          num_beams=1, length_penalty=0.0)
    assert got == out


def test_eval_cli_flags_reach_eval_model():
    """--int8_kv / --cache_demo_latents plumb through build_parser into
    the OpenFlamingoEvalModel constructor arguments."""
    from open_flamingo_tpu.eval.evaluate import build_parser

    args = build_parser().parse_args(
        ["--int8_kv", "--cache_demo_latents", "--int8_resident",
         "--demo_latents_cache_size", "7"]
    )
    assert args.int8_kv and args.cache_demo_latents and args.int8_resident
    assert args.demo_latents_cache_size == 7
    # defaults off
    d = build_parser().parse_args([])
    assert not d.int8_kv and not d.cache_demo_latents
    assert not d.int8_resident


def test_evaluate_captioning_multiprocess_gather_merge(
    eval_setup, tmp_path, rng
):
    """Multi-host prediction merge (reference all_gather_object,
    evaluate.py:862 -> parallel.distributed.process_allgather): a
    gather returning SEVERAL overlapping per-process prediction dicts
    must dedupe by image_id and score identically to the single-host
    run; non-zero ranks return None. Also pins process_allgather's
    single-process contract ([obj])."""
    from open_flamingo_tpu.eval.eval_datasets import CaptionDataset
    from open_flamingo_tpu.parallel.distributed import process_allgather

    em, _ = eval_setup
    img_dir, ann = _make_caption_data(tmp_path, rng)
    train = CaptionDataset(img_dir, ann, True, "coco", img_dir)
    test = CaptionDataset(img_dir, ann, False, "coco", img_dir)
    common = dict(
        num_shots=2, batch_size=2, num_samples=4, query_set_size=8,
        max_generation_length=4, num_beams=1,
    )
    base = evaluate_captioning(em, train, test, **common)

    calls = []

    def fake_gather(preds):
        # simulate 2 hosts: this host's shard + an overlapping copy
        # (duplicate ids must collapse, not double-count)
        calls.append(len(preds))
        items = sorted(preds.items())
        half = {k: v for k, v in items[: max(1, len(items) // 2)]}
        return [preds, half]

    merged = evaluate_captioning(
        em, train, test, gather=fake_gather, **common
    )
    assert calls, "gather was never invoked"
    np.testing.assert_allclose(merged, base, atol=1e-9)

    other_rank = evaluate_captioning(
        em, train, test, gather=fake_gather, rank=1, **common
    )
    assert other_rank is None

    assert process_allgather({"a": 1}) == [{"a": 1}]
