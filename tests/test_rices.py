"""RICES tests: projected encode_image parity vs HF CLIPModel
get_image_features, retrieval ordering (most-similar LAST), cached
features, and the retrieval-encoder builder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.convert.hf_clip import (
    convert_clip_vision_params,
    vision_config_from_hf,
)
from open_flamingo_tpu.eval.rices import (
    RICES,
    RetrievalEncoder,
    create_retrieval_encoder,
)
from open_flamingo_tpu.image_processing import ImageProcessor
from open_flamingo_tpu.models.vit import VisionTransformer

torch = pytest.importorskip("torch")


def _tiny_hf_clip():
    import transformers

    cfg = transformers.CLIPConfig(
        projection_dim=16,
        vision_config=dict(
            image_size=28, patch_size=7, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            hidden_act="quick_gelu", attention_dropout=0.0, projection_dim=16,
        ),
        text_config=dict(
            hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
            intermediate_size=64, vocab_size=99,
        ),
    )
    torch.manual_seed(0)
    return transformers.CLIPModel(cfg).eval()


def test_projected_features_match_hf_get_image_features(rng):
    """encode_image semantics (ln_post(CLS) @ proj) must match HF CLIPModel
    get_image_features — the embedding the reference RICES retrieves with
    (eval/rices.py:58)."""
    hf = _tiny_hf_clip()
    cfg = vision_config_from_hf(hf.config.vision_config)
    assert cfg.projection_dim == 16
    converted = convert_clip_vision_params(hf.state_dict(), cfg)
    assert "proj" in converted

    model = VisionTransformer(cfg=cfg)
    dummy = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), dummy, output="projected")
    params = {"params": jax.tree.map(jnp.asarray, converted)}

    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf.get_image_features(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(imgs), output="projected"))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


class _FixtureDataset:
    """Images with known unit feature directions via a stub encoder."""

    def __init__(self, n):
        self.items = [
            {"id": i, "image": np.full((28, 28, 3), i, np.float32)}
            for i in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _StubEncoder:
    """Deterministic features: image filled with value v -> e_{v mod D}."""

    D = 4

    def preprocess(self, image):
        return np.asarray(image, np.float32)

    def embed(self, images_np):
        vals = images_np.reshape(images_np.shape[0], -1)[:, 0].astype(int)
        out = np.zeros((len(vals), self.D), np.float32)
        out[np.arange(len(vals)), vals % self.D] = 1.0
        return out


def test_retrieval_ordering_fixture():
    """find() returns the top-k most similar, MOST SIMILAR LAST
    (reference rices.py:92-95)."""
    ds = _FixtureDataset(8)  # features e0 e1 e2 e3 e0 e1 e2 e3
    r = RICES(ds, _StubEncoder(), batch_size=4)
    assert r.features.shape == (8, 4)

    # query with value 2 -> exact matches are items 2 and 6 (sim 1),
    # everything else sim 0; top-4 must END with an exact match and
    # contain both exact matches in the last two slots.
    demos = r.find([np.full((28, 28, 3), 2, np.float32)], 4)[0]
    ids = [d["id"] for d in demos]
    assert set(ids[-2:]) == {2, 6}
    assert set(ids[:2]).isdisjoint({2, 6})

    # k=2: exactly the two matches
    demos = r.find([np.full((28, 28, 3), 6, np.float32)], 2)[0]
    assert {d["id"] for d in demos} == {2, 6}


def test_cached_features_roundtrip(tmp_path):
    ds = _FixtureDataset(6)
    r = RICES(ds, _StubEncoder(), batch_size=3)
    p = str(tmp_path / "feats.npy")
    r.save_features(p)
    r2 = RICES(ds, _StubEncoder(), cached_features=np.load(p))
    np.testing.assert_array_equal(r2.features, r.features)


def test_create_retrieval_encoder_from_local_hf(tmp_path, rng):
    """Builder resolves a local HF CLIP checkpoint (the offline stand-in
    for --rices_vision_encoder_path/pretrained)."""
    hf = _tiny_hf_clip()
    ckpt = tmp_path / "clip-tiny"
    hf.save_pretrained(ckpt, safe_serialization=True)

    enc = create_retrieval_encoder(str(ckpt))
    assert isinstance(enc, RetrievalEncoder)
    assert enc.projected
    img = rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)
    feats = enc.embed(enc.preprocess(img)[None])
    assert feats.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)

    # and against HF end-to-end on the same preprocessed pixels
    px = enc.preprocess(img)
    with torch.no_grad():
        want = hf.get_image_features(
            pixel_values=torch.tensor(px.transpose(2, 0, 1)[None])
        ).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    np.testing.assert_allclose(feats, want, atol=3e-5, rtol=1e-3)


def test_create_retrieval_encoder_random_fallback(capsys):
    enc = create_retrieval_encoder("ViT-B-32", "openai")
    out = capsys.readouterr().out
    assert "random init" in out
    assert enc.model.cfg.projection_dim == 512
