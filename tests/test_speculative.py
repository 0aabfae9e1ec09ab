"""Speculative decoding (speculative.py): the verification contract —
the output must EXACTLY equal the target model's own greedy decode,
whatever the draft proposes. Random mismatched drafts exercise the
rejection/rollback path; draft==target exercises full acceptance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.speculative import speculative_generate


def _models(rng, family="mpt", draft_seed=7):
    from test_quantize import _tiny_family_model

    model, params, vision_x, ids, mask = _tiny_family_model(family, rng)
    draft = model  # same architecture, independently-initialized params
    draft_params = model.init(jax.random.PRNGKey(draft_seed), vision_x,
                              ids, mask)
    return model, params, draft, draft_params, vision_x, ids, mask


@pytest.mark.parametrize("gamma", [1, 2, 4])
def test_speculative_exact_vs_greedy_random_draft(rng, gamma):
    """A random (useless) draft must still yield the target's exact
    greedy tokens — only speed may differ."""
    model, params, draft, dparams, vision_x, ids, mask = _models(rng)
    cfg = GenerationConfig(max_new_tokens=7, pad_token_id=0,
                           eos_token_id=-1)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    got = np.asarray(speculative_generate(
        model, params, draft, dparams, vision_x, ids, mask, cfg,
        num_draft_tokens=gamma,
    ))
    np.testing.assert_array_equal(got, want)


def test_speculative_exact_full_acceptance(rng):
    """draft == target: every draft accepted, output still exact."""
    model, params, draft, _, vision_x, ids, mask = _models(rng)
    cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                           eos_token_id=-1)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    got = np.asarray(speculative_generate(
        model, params, model, params, vision_x, ids, mask, cfg,
        num_draft_tokens=3,
    ))
    np.testing.assert_array_equal(got, want)


def test_speculative_eos_and_padding(rng):
    """EOS mid-generation + left-padded prompts: pad-fill after EOS must
    match the greedy loop exactly. Force EOS by making it likely: pick
    the token the model actually generates as the eos id."""
    model, params, draft, dparams, vision_x, ids, mask = _models(rng)
    mask = mask.at[0, :2].set(0)     # left-pad one sequence
    probe = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                             eos_token_id=-1)
    toks = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, probe)
    )
    eos_id = int(toks[0, 2])         # generated mid-stream -> real EOS
    cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                           eos_token_id=eos_id)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    got = np.asarray(speculative_generate(
        model, params, draft, dparams, vision_x, ids, mask, cfg,
        num_draft_tokens=3,
    ))
    np.testing.assert_array_equal(got, want)


def test_speculative_min_new_tokens(rng):
    model, params, draft, dparams, vision_x, ids, mask = _models(rng)
    probe = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                             eos_token_id=-1)
    toks = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, probe)
    )
    eos_id = int(toks[0, 1])
    cfg = GenerationConfig(max_new_tokens=6, min_new_tokens=4,
                           pad_token_id=0, eos_token_id=eos_id)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    got = np.asarray(speculative_generate(
        model, params, draft, dparams, vision_x, ids, mask, cfg,
        num_draft_tokens=2,
    ))
    np.testing.assert_array_equal(got, want)


def test_speculative_scan_target(rng):
    """Scan-layout target (the production engine) + unrolled draft."""
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    sc_params = {"params": p}
    scanned = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    dparams = model.init(jax.random.PRNGKey(3), vision_x, ids, mask)
    cfg = GenerationConfig(max_new_tokens=6, pad_token_id=0,
                           eos_token_id=-1)
    want = np.asarray(
        flamingo_generate(scanned, sc_params, vision_x, ids, mask, cfg)
    )
    got = np.asarray(speculative_generate(
        scanned, sc_params, model, dparams, vision_x, ids, mask, cfg,
        num_draft_tokens=3,
    ))
    np.testing.assert_array_equal(got, want)


def test_speculative_return_stats_and_latents(rng):
    """return_stats counts verify iterations (full acceptance commits
    D+1/iter); media_latents= skips the vision encode and is exact."""
    from open_flamingo_tpu.models.flamingo import Flamingo

    model, params, draft, dparams, vision_x, ids, mask = _models(rng)
    cfg = GenerationConfig(max_new_tokens=8, pad_token_id=0,
                           eos_token_id=-1)
    want = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    # self-draft: acceptance is total, so 8 tokens need ceil(8/4)=2 iters
    got, stats = speculative_generate(
        model, params, model, params, vision_x, ids, mask, cfg,
        num_draft_tokens=3, return_stats=True,
    )
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(stats["iters"]) == 2
    # random draft needs at least as many verifies
    _, stats_rand = speculative_generate(
        model, params, draft, dparams, vision_x, ids, mask, cfg,
        num_draft_tokens=3, return_stats=True,
    )
    assert int(stats_rand["iters"]) >= 2
    # precomputed latents: identical output, no vision encode
    latents = model.apply(params, vision_x, method=Flamingo.embed_vision)
    got_lat = np.asarray(speculative_generate(
        model, params, draft, dparams, None, ids, mask, cfg,
        num_draft_tokens=3, media_latents=latents,
    ))
    np.testing.assert_array_equal(got_lat, want)


def test_eval_model_speculative_path(rng):
    """OpenFlamingoEvalModel with speculative_draft_params emits the
    same text as the plain greedy path (exactness contract) via the
    jitted speculative generate."""
    from test_quantize import _tiny_family_model

    from open_flamingo_tpu.eval.eval_model import OpenFlamingoEvalModel
    from open_flamingo_tpu.quantize import quantize_decode_params
    from open_flamingo_tpu.tokenization import SimpleTokenizer

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    tok = SimpleTokenizer(["hello", "world", "a", "b", "c"])
    imgs = [[np.asarray(v, np.float32) for v in row]
            for row in np.asarray(vision_x[:, :, 0])]
    draft = quantize_decode_params(
        {"params": params["params"]}, bits=8
    )
    kw = dict(image_processor=lambda im: im, tokenizer=tok)
    plain = OpenFlamingoEvalModel(model, params, **kw)
    spec = OpenFlamingoEvalModel(
        model, params, speculative_draft_params=draft,
        speculative_tokens=2, **kw,
    )
    texts = ["<image>hello world a"] * len(imgs)
    out_plain = plain.get_outputs(texts, imgs, max_generation_length=6,
                                  num_beams=1)
    out_spec = spec.get_outputs(texts, imgs, max_generation_length=6,
                                num_beams=1)
    assert out_plain == out_spec
