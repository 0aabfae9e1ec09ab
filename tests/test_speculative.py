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
