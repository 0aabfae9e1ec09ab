"""Continuous-batching serving engine: emitted tokens must EXACTLY
match flamingo_generate's greedy output per request, whatever the
admission order — late admissions, mixed prompt lengths, EOS retire,
epoch reset. CPU/einsum path (the engine reuses the decode machinery
unchanged, so kernel parity is covered by the decode suites)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.serving import ServingEngine

from test_flamingo import tiny_flamingo

IMG = 14


def _reqs(rng, n, t_img=1, p_max=16):
    """n requests with ragged prompt lengths, each with t_img images."""
    model = tiny_flamingo()
    media_id = model.cfg.media_token_id
    out = []
    for i in range(n):
        p = int(rng.integers(6, p_max + 1))
        ids = rng.integers(10, 40, size=(p,)).astype(np.int32)
        ids[0] = media_id
        vx = rng.normal(size=(t_img, 1, IMG, IMG, 3)).astype(np.float32)
        out.append((vx, ids))
    return model, out


def _reference(model, params, reqs, max_new, eos=-1):
    """Per-request flamingo_generate greedy tokens (B=1, exact)."""
    cfg = GenerationConfig(
        max_new_tokens=max_new, pad_token_id=0, eos_token_id=eos
    )
    outs = []
    for vx, ids in reqs:
        out = flamingo_generate(
            model, params, jnp.asarray(vx[None], jnp.float32),
            jnp.asarray(ids[None]), jnp.ones((1, len(ids)), jnp.int32),
            cfg,
        )
        outs.append(np.asarray(out)[0])
    return outs


def _check(got, want, eos):
    """Engine emits through EOS (no pad tail); generate pads to
    max_new."""
    got = np.asarray(got)
    np.testing.assert_array_equal(got, want[: len(got)])
    assert (eos in got) or len(got) == len(want)


def test_serving_matches_generate_all_at_once(rng):
    model, reqs = _reqs(rng, 5)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    want = _reference(model, params, reqs, max_new=7)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=4,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
    )
    rids = [eng.submit(vx, ids, max_new_tokens=7) for vx, ids in reqs]
    res = eng.run()
    assert set(res) == set(rids)
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)


def test_serving_staggered_admissions(rng):
    """Requests submitted while others are mid-decode: late rows are
    admitted at a later global slot and must still be exact."""
    model, reqs = _reqs(rng, 6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    want = _reference(model, params, reqs, max_new=6)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=3,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
    )
    rids = []
    it = iter(reqs)
    # two up-front, then one new submission after every engine step
    for vx, ids in [next(it), next(it)]:
        rids.append(eng.submit(vx, ids, max_new_tokens=6))
    alive = True
    while alive:
        alive = eng.step()
        nxt = next(it, None)
        if nxt is not None:
            rids.append(eng.submit(nxt[0], nxt[1], max_new_tokens=6))
            alive = True
    res = eng._results
    assert len(res) == 6
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)


def test_serving_eos_retire_and_reuse(rng):
    """A row retired by EOS is re-admitted; the tenant swap must not
    leak cache/media state between requests. EOS is forced by using a
    token the model actually generates."""
    model, reqs = _reqs(rng, 4)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    probe = _reference(model, params, reqs, max_new=6)
    eos = int(probe[0][2])          # mid-stream token -> real EOS
    want = _reference(model, params, reqs, max_new=6, eos=eos)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=4,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=eos),
    )
    rids = [eng.submit(vx, ids, max_new_tokens=6) for vx, ids in reqs]
    res = eng.run()
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=eos)


def test_serving_epoch_reset(rng):
    """More work than one epoch's slots: the engine drains, resets the
    global index, and stays exact across the reset. max_new=9 with
    chunk 4 gives a 12-slot horizon that does NOT divide the 32
    decode slots — admissions must stop early (the drain path), unlike
    budgets that retire exactly at the last slot."""
    model, reqs = _reqs(rng, 8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    want = _reference(model, params, reqs, max_new=9)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=48, max_prompt_len=16,
        chunk_tokens=4,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
    )
    rids = [eng.submit(vx, ids, max_new_tokens=9) for vx, ids in reqs]
    res = eng.run()
    assert len(res) == 8
    assert eng.epochs >= 1          # the drain/reset path actually ran
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_serving_pipelined_dispatch_exact(rng, depth):
    """pipeline_depth > 0 keeps chunks in flight before harvesting on
    the host; emitted tokens must still be exactly flamingo_generate's
    per request across EOS retires, row re-tenancy, and epoch resets —
    the dispatch-time tenancy snapshot is what keeps a finished
    tenant's pad chunks out of the next tenant's stream."""
    model, reqs = _reqs(rng, 8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    probe = _reference(model, params, reqs, max_new=9)
    eos = int(probe[0][2])          # mid-stream token -> real EOS fires
    want = _reference(model, params, reqs, max_new=9, eos=eos)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=48, max_prompt_len=16,
        chunk_tokens=4, pipeline_depth=depth,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=eos),
    )
    rids = [eng.submit(vx, ids, max_new_tokens=9) for vx, ids in reqs]
    res = eng.run()
    assert len(res) == 8
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=eos)


def test_serving_pipelined_staggered(rng):
    """Pipelined dispatch with requests arriving mid-flight: admissions
    observed late must still produce exact tokens in admission order."""
    model, reqs = _reqs(rng, 6)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    want = _reference(model, params, reqs, max_new=6)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=3, pipeline_depth=2,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
    )
    rids = []
    it = iter(reqs)
    for vx, ids in [next(it), next(it)]:
        rids.append(eng.submit(vx, ids, max_new_tokens=6))
    alive = True
    while alive:
        alive = eng.step()
        nxt = next(it, None)
        if nxt is not None:
            rids.append(eng.submit(nxt[0], nxt[1], max_new_tokens=6))
            alive = True
    res = eng._results
    assert len(res) == 6
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)


def test_serving_scan_layout(rng):
    """Scan (group-stacked) cache layout end-to-end."""
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout

    model, reqs = _reqs(rng, 3)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    want = _reference(model, params, reqs, max_new=6)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=3,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
    )
    rids = [eng.submit(vx, ids, max_new_tokens=6) for vx, ids in reqs]
    res = eng.run()
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)


def test_serving_int8_kv_matches_generate_int8(rng, monkeypatch):
    """Engine with int8 KV/media caches == flamingo_generate with
    int8_kv (both quantized — same kernels, same math), scan layout,
    FORCE_FUSED+INTERPRET. Engagement checked via the cache dtype."""
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.models.lm import to_scanned_layout
    from open_flamingo_tpu.ops import dense_stream
    from test_quantize import _tiny_family_model

    model, params, vision_x, ids, mask = _tiny_family_model("mpt", rng)
    lm_sc = to_scanned_layout(
        jax.tree.map(np.asarray, params["params"]["lm"]),
        model.cfg.lm.num_layers, model.cfg.cross_attn_every_n,
    )
    p = dict(params["params"])
    p["lm"] = jax.tree.map(jnp.asarray, lm_sc)
    params = {"params": p}
    model = Flamingo(cfg=dataclasses.replace(model.cfg, scan_layers=True))
    monkeypatch.setattr(dense_stream, "FORCE_FUSED", True)
    monkeypatch.setattr(dense_stream, "INTERPRET", True)

    b, t = ids.shape
    want_all = np.asarray(flamingo_generate(
        model, params, vision_x, ids, mask,
        GenerationConfig(max_new_tokens=6, pad_token_id=0,
                         eos_token_id=-1, int8_kv=True),
    ))

    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96,
        max_prompt_len=16, chunk_tokens=3,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1, int8_kv=True),
    )
    assert eng._int8_kv
    rids = []
    for i in range(b):
        pad = 16 - t
        row_ids = np.concatenate(
            [np.zeros((pad,), np.int32), np.asarray(ids[i])]
        )
        row_mask = np.concatenate(
            [np.zeros((pad,), np.int32), np.asarray(mask[i])]
        )
        rids.append(eng.submit(
            np.asarray(vision_x[i], np.float32), row_ids,
            attention_mask=row_mask, max_new_tokens=6,
        ))
    res = eng.run()
    assert eng._state["cache"].layers[0].k.dtype == jnp.int8
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(res[rid], want_all[i])


@pytest.mark.parametrize("chunk", [2, 3])
def test_serving_absorb_vision_exact(rng, monkeypatch, chunk):
    """absorb_vision=True: queued requests' ViT rides the decode chunks
    as side tiles (cycles span chunk boundaries; chunk=3 exercises the
    tail graph where n_abs < chunk), admissions consume the pooled
    latents through the vision-skipping prefill — tokens must EXACTLY
    match flamingo_generate per request, and the pool must actually
    serve admissions (hits > 0)."""
    import dataclasses as dc

    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import (
        Flamingo,
        FlamingoConfig,
    )
    from open_flamingo_tpu.models.vit import VisionConfig
    from open_flamingo_tpu.ops import dense_stream, vit_attention
    from test_flamingo import EOC, MEDIA, VOCAB

    # geometry the absorb schedule carries (tests/test_absorb_vit.py
    # notes): slots/layer 8, macro 4 <= g 4; 4 ViT layers, per_step 1
    # -> a 4-step cycle spanning multiple chunks
    vis = VisionConfig(
        image_size=16, patch_size=8, hidden_size=32, num_layers=4,
        num_heads=2, intermediate_size=64,
    )
    lm = DecoderConfig(
        family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=4,
        num_heads=4, intermediate_size=64, alibi=True,
        attention_bias=False, ln_no_bias=True,
    )
    cfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=8, scan_layers=True,
    )
    model = Flamingo(cfg=cfg)
    media_id = cfg.media_token_id
    reqs = []
    for _ in range(6):
        p = int(rng.integers(6, 17))
        ids = rng.integers(10, 40, size=(p,)).astype(np.int32)
        ids[0] = media_id
        vx = rng.normal(size=(1, 1, 16, 16, 3)).astype(np.float32)
        reqs.append((vx, ids))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(reqs[0][0][None], jnp.float32),
        jnp.asarray(reqs[0][1][None]),
        jnp.ones((1, len(reqs[0][1])), jnp.int32),
    )

    monkeypatch.setattr(dense_stream, "FORCE_FUSED", True)
    monkeypatch.setattr(dense_stream, "INTERPRET", True)
    monkeypatch.setattr(vit_attention, "INTERPRET", True)

    want = _reference(model, params, reqs, max_new=4)
    eng = ServingEngine(
        model, params, batch_size=2, max_seq_len=96, max_prompt_len=16,
        chunk_tokens=chunk,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=0,
                             eos_token_id=-1),
        absorb_vision=True, absorb_batch=2,
    )
    assert eng._absorb_on
    rids = [eng.submit(vx, ids, max_new_tokens=4) for vx, ids in reqs]
    res = eng.run()
    assert set(res) == set(rids)
    for rid, w in zip(rids, want):
        _check(res[rid], w, eos=-1)
    # the pre-encode pool actually served admissions and the plan
    # engaged (not the serial fallback)
    assert eng._abs_plan is not None and eng._abs_plan.n_steps == 4
    assert eng.absorb_hits > 0
