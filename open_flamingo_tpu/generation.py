"""Autoregressive generation over the explicit KVCache: greedy, sampling,
and beam search.

Capability parity with the HF generate() kwargs the reference exercises
(open_flamingo/eval/models/open_flamingo.py:140-148: num_beams,
length_penalty, min/max_new_tokens, eos=<|endofchunk|>; src/flamingo.py:
124-175), built as compiled lax.scan loops with static shapes.

Vision is encoded exactly once; every decode step attends to the cached
media via the cached-media text-time rule (flamingo_lm.py:142-151).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.decoders.common import KVCache, LayerKV
from .models.flamingo import Flamingo, count_media

NEG_INF = jnp.float32(-1.0e7)


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int
    min_new_tokens: int = 0
    num_beams: int = 1
    length_penalty: float = 1.0
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    eos_token_id: Optional[int] = None
    pad_token_id: int = 0
    # int8 KV + media caches (per-token scales): halves the per-step
    # cache DMA. Engages only when the stacked-weight scan decode
    # engine will run (scan_layers model, fused decode available) —
    # silently stays bf16 otherwise.
    int8_kv: bool = False


# StepFn: (tokens (N,1), mask (N,1), cache) -> (logits (N,1,V), cache)
StepFn = Callable[[jax.Array, jax.Array, KVCache], Tuple[jax.Array, KVCache]]


def _process_logits(
    logits: jax.Array, step: jax.Array, cfg: GenerationConfig
) -> jax.Array:
    """min_new_tokens: forbid EOS before the minimum length."""
    if cfg.eos_token_id is not None and cfg.min_new_tokens > 0:
        forbid = step < cfg.min_new_tokens
        eos_mask = jnp.zeros((logits.shape[-1],), bool).at[cfg.eos_token_id].set(True)
        logits = jnp.where(forbid & eos_mask[None, :], NEG_INF, logits)
    return logits


def _sample_token(
    logits: jax.Array, rng: jax.Array, cfg: GenerationConfig
) -> jax.Array:
    if not cfg.do_sample:
        return jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -cfg.top_k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep smallest set with cumulative prob >= top_p (incl. first over)
        cutoff_idx = jnp.sum((cum < cfg.top_p).astype(jnp.int32), axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, NEG_INF, logits)
    return jax.random.categorical(rng, logits, axis=-1)


def greedy_or_sample(
    step_fn: StepFn,
    first_logits: jax.Array,
    cache: KVCache,
    cfg: GenerationConfig,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Scan decode loop. first_logits: (B, V) logits at the last prompt
    position. Returns generated ids (B, max_new_tokens), pad-filled after
    EOS."""
    b = first_logits.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def body(carry, _):
        logits, cache, finished, step, rng = carry
        rng, sub = jax.random.split(rng)
        logits = _process_logits(logits, step, cfg)
        tok = _sample_token(logits, sub, cfg)
        if cfg.eos_token_id is not None:
            tok = jnp.where(finished, cfg.pad_token_id, tok)
            finished = finished | (tok == cfg.eos_token_id)
        new_logits, cache = step_fn(tok[:, None], jnp.ones((b, 1), jnp.int32), cache)
        return (new_logits[:, 0], cache, finished, step + 1, rng), tok

    init = (first_logits, cache, jnp.zeros((b,), bool), jnp.zeros((), jnp.int32), rng)
    _, tokens = jax.lax.scan(body, init, None, length=cfg.max_new_tokens)
    return tokens.T  # (B, max_new_tokens)


def greedy_absorb(
    step_fn: StepFn,
    absorb_step_fn,
    first_logits: jax.Array,
    cache: KVCache,
    cfg: GenerationConfig,
    xw0: jax.Array,
    vp_steps,
    n_abs: int,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """greedy_or_sample with the first n_abs steps carrying the NEXT
    batch's absorbed-ViT side schedule (models/absorb_vit.py): two
    scans — the absorb phase consumes vp_steps (one tree slice of ViT
    layer params per decode step) and threads the flat vision
    workspace; the remainder runs the plain step. Token stream is
    IDENTICAL to greedy_or_sample (side tiles never touch the main
    kernels' outputs — tests/test_absorb_vit.py).

    Returns (tokens (B, max_new), final ViT workspace (m_pad, D))."""
    b = first_logits.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def make_body(absorb: bool):
        def body(carry, xs):
            logits, cache, finished, step, rng, xw = carry
            rng, sub = jax.random.split(rng)
            logits = _process_logits(logits, step, cfg)
            tok = _sample_token(logits, sub, cfg)
            if cfg.eos_token_id is not None:
                tok = jnp.where(finished, cfg.pad_token_id, tok)
                finished = finished | (tok == cfg.eos_token_id)
            mask = jnp.ones((b, 1), jnp.int32)
            if absorb:
                new_logits, cache, xw = absorb_step_fn(
                    tok[:, None], mask, cache, xw, xs
                )
            else:
                new_logits, cache = step_fn(tok[:, None], mask, cache)
            return (new_logits[:, 0], cache, finished, step + 1, rng, xw), tok
        return body

    init = (
        first_logits, cache, jnp.zeros((b,), bool),
        jnp.zeros((), jnp.int32), rng, xw0,
    )
    carry, toks_a = jax.lax.scan(
        make_body(True), init, vp_steps, length=n_abs
    )
    xw_final = carry[5]
    carry, toks_b = jax.lax.scan(
        make_body(False), carry, None, length=cfg.max_new_tokens - n_abs
    )
    return jnp.concatenate([toks_a, toks_b], axis=0).T, xw_final


# --- beam search -----------------------------------------------------------


def _gather_beams(tree, indices, batch, beams):
    """Gather along the beam axis of a KVCache's arrays.

    The batch axis position is taken from each LayerKV field explicitly
    (k/v: axis 0, or 1 group-stacked; int8 scales are head-leading
    (H_kv, B*K, S): axis 1, or 2 stacked) — shape-based guessing is
    unsound (H_kv or G can equal batch*beams).

    A KVCache's `media` field is skipped: all beams of a batch element
    share the same (replicated) prompt media, so the gather would be an
    identity permutation — copying megabytes of static K/V per step."""

    def gather_axis(x, axis):
        if x is None:
            return None
        xr = x.reshape(*x.shape[:axis], batch, beams, *x.shape[axis + 1:])
        idx = indices.reshape(
            *([1] * axis), batch, beams, *([1] * (x.ndim - axis - 1))
        )
        return jnp.take_along_axis(xr, idx, axis=axis + 1).reshape(x.shape)

    def g_layer(l):
        ax = 1 if l.k.ndim == 5 else 0      # group-stacked scan cache
        return LayerKV(
            k=gather_axis(l.k, ax), v=gather_axis(l.v, ax),
            k_s=gather_axis(l.k_s, ax + 1), v_s=gather_axis(l.v_s, ax + 1),
        )

    return tree.replace(
        layers=tuple(g_layer(l) for l in tree.layers),
        pad_mask=gather_axis(tree.pad_mask, 0),
    )


def _repeat_beams(cache: KVCache, k: int) -> KVCache:
    """Replicate each batch row's cache k times (beam-major: batch b's
    beams land at rows b*k..b*k+k-1). The inverse-shape companion of
    _gather_beams, run ONCE after the (B-row) prefill so the prompt
    forward never executes per beam. Media K/V is replicated too —
    decode rows index it per-row."""

    def rep(x, axis):
        return None if x is None else jnp.repeat(x, k, axis=axis)

    def r_layer(l):
        ax = 1 if l.k.ndim == 5 else 0      # group-stacked scan cache
        return LayerKV(
            k=rep(l.k, ax), v=rep(l.v, ax),
            k_s=rep(l.k_s, ax + 1), v_s=rep(l.v_s, ax + 1),
        )

    media = cache.media
    if media is not None:
        media = tuple(r_layer(l) for l in media)
    return cache.replace(
        layers=tuple(r_layer(l) for l in cache.layers),
        pad_mask=rep(cache.pad_mask, 0),
        media=media,
    )


def beam_search(
    step_fn: StepFn,
    first_logits: jax.Array,
    cache: KVCache,
    cfg: GenerationConfig,
    prompt_len: int = 0,
) -> jax.Array:
    """Standard length-penalized beam search (HF semantics: hypothesis
    score = sum logprob / len**length_penalty at EOS or max length, where
    len is the FULL decoder sequence incl. the (left-padded) prompt —
    HF BeamHypotheses.add uses hyp.shape[-1]; pass prompt_len to match).

    first_logits: (B*K, V) — prompt already replicated beam-major
    (batch b's beams at rows b*K..b*K+K-1), as is the cache.
    Returns (B, max_new_tokens) best sequences.
    """
    k = cfg.num_beams
    bk, vocab = first_logits.shape
    b = bk // k
    eos = cfg.eos_token_id
    L = cfg.max_new_tokens

    # live beam scores: beam 0 starts at 0, others -inf (identical prefixes)
    live_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None], (b, 1)
    )
    live_seqs = jnp.full((b, k, L), cfg.pad_token_id, jnp.int32)
    fin_scores = jnp.full((b, k), NEG_INF)
    fin_seqs = jnp.full((b, k, L), cfg.pad_token_id, jnp.int32)

    def body(carry, _):
        logits, cache, live_scores, live_seqs, fin_scores, fin_seqs, step = carry
        logits = _process_logits(logits, step, cfg)
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logprobs = logprobs.reshape(b, k, vocab)
        cand = live_scores[:, :, None] + logprobs  # (b, k, V)
        flat = cand.reshape(b, k * vocab)

        # top 2k so EOS picks don't starve the live set
        top_scores, top_idx = jax.lax.top_k(flat, 2 * k)
        top_beam = top_idx // vocab          # (b, 2k)
        top_tok = top_idx % vocab

        seq_len = step + 1
        new_seqs = jnp.take_along_axis(live_seqs, top_beam[:, :, None], axis=1)
        new_seqs = jnp.where(
            (jnp.arange(L)[None, None, :] == step), top_tok[:, :, None], new_seqs
        )

        if eos is not None:
            is_eos = top_tok == eos
            # finished hypotheses: apply length penalty
            lp = (prompt_len + seq_len).astype(jnp.float32) ** cfg.length_penalty
            cand_fin_scores = jnp.where(is_eos, top_scores / lp, NEG_INF)
            all_fin_scores = jnp.concatenate([fin_scores, cand_fin_scores], axis=1)
            all_fin_seqs = jnp.concatenate([fin_seqs, new_seqs], axis=1)
            fin_top, fin_idx = jax.lax.top_k(all_fin_scores, k)
            fin_scores = fin_top
            fin_seqs = jnp.take_along_axis(all_fin_seqs, fin_idx[:, :, None], axis=1)
            # live: mask out EOS candidates, take top k
            live_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        else:
            live_cand_scores = top_scores

        live_top, live_idx = jax.lax.top_k(live_cand_scores, k)
        live_scores = live_top
        live_seqs = jnp.take_along_axis(new_seqs, live_idx[:, :, None], axis=1)
        chosen_beam = jnp.take_along_axis(top_beam, live_idx, axis=1)  # (b, k)
        chosen_tok = jnp.take_along_axis(top_tok, live_idx, axis=1)

        cache = _gather_beams(cache, chosen_beam, b, k)
        new_logits, cache = step_fn(
            chosen_tok.reshape(bk, 1), jnp.ones((bk, 1), jnp.int32), cache
        )
        return (
            new_logits[:, 0],
            cache,
            live_scores,
            live_seqs,
            fin_scores,
            fin_seqs,
            step + 1,
        ), None

    init = (
        first_logits,
        cache,
        live_scores,
        live_seqs,
        fin_scores,
        fin_seqs,
        jnp.zeros((), jnp.int32),
    )
    (logits, cache, live_scores, live_seqs, fin_scores, fin_seqs, _), _ = (
        jax.lax.scan(body, init, None, length=L)
    )

    # finalize: live beams count as hypotheses at max length
    lp = jnp.float32(prompt_len + L) ** cfg.length_penalty
    all_scores = jnp.concatenate([fin_scores, live_scores / lp], axis=1)
    all_seqs = jnp.concatenate([fin_seqs, live_seqs], axis=1)
    best = jnp.argmax(all_scores, axis=1)
    return jnp.take_along_axis(all_seqs, best[:, None, None], axis=1)[:, 0]


# --- Flamingo front-end ----------------------------------------------------


def flamingo_generate(
    model: Flamingo,
    params,
    vision_x: Optional[jax.Array],
    lang_x: jax.Array,
    attention_mask: jax.Array,
    cfg: GenerationConfig,
    rng: Optional[jax.Array] = None,
    media_latents: Optional[jax.Array] = None,
    next_pixels: Optional[jax.Array] = None,
) -> jax.Array:
    """End-to-end generation mirroring Flamingo.generate
    (open_flamingo/src/flamingo.py:124-175): encode vision once, replicate
    per beam, prefill, decode with cached media. Returns generated ids
    (B, max_new_tokens) (prompt not included).

    media_latents: precomputed (B, T_img, n_latents, D) perceiver
    latents — skips the vision encode entirely (the eval harness's
    demo-latent cache computes each unique image's latents once).

    next_pixels: (B', T', F', H, W, C) pixels of the NEXT batch. When
    given, returns (tokens, next_media_latents): the next batch's ViT
    forward rides THIS batch's decode loop as absorbed side tiles
    (models/absorb_vit.py) when the geometry allows, else runs
    serially after — either way next_media_latents feeds the next
    call's media_latents=. Token stream identical in all cases."""
    b, t = lang_x.shape
    k = cfg.num_beams
    # round the cache up to the fused decode kernels' S-block quantum
    # (extra slots stay masked in pad_mask — semantics unchanged)
    cache_len = -(-(t + cfg.max_new_tokens) // 16) * 16

    # Tensor-parallel params (model-axis sharded) cannot feed the fused
    # decode pallas_calls — detect from concrete params (no-op for
    # tracer params under an outer jit; such callers must invoke
    # ops.dense_stream.note_params_sharding themselves).
    from .ops import dense_stream

    if not any(
        isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(params)
    ):
        dense_stream.note_params_sharding(params)

    # int4 decode (quantize_decode_params bits=4): materialize the
    # packed int4 stream in-graph, once, outside the decode loop
    from .quantize import activate_int4_stream

    params = activate_int4_stream(params)

    if media_latents is not None:
        latents = media_latents.astype(model.dtype)
    else:
        latents = model.apply(params, vision_x, method=Flamingo.embed_vision)
    n_media = count_media(lang_x, model.cfg.media_token_id)

    # Beam replication happens AFTER prefill: all K beams of a batch row
    # share an identical prompt, so prefilling at B*K rows would re-run
    # the compute-bound prompt forward K times for K identical results
    # (measured 3x the prefill cost at the eval harness's beam 3,
    # BASELINE.md round 4). Prefill at B; _repeat_beams copies the
    # cache/logits beam-major afterwards (a one-off HBM copy).
    if k > 1:
        decode_latents = jnp.repeat(latents, k, axis=0)
        n_media = jnp.repeat(n_media, k, axis=0)
    else:
        decode_latents = latents

    # K/V cache in the model's compute dtype: decode is cache-bandwidth
    # bound, fp32 K/V would double the HBM traffic of every step.
    # scan models keep the cache group-stacked end-to-end (no per-step
    # stack/unstack copies in the stacked-weight decode engine).
    scan_groups = None
    if model.cfg.scan_layers:
        n = model.cfg.cross_attn_every_n or 1
        scan_groups = model.cfg.lm.num_layers // n
    # int8 caches only where the scan fused engine is guaranteed to
    # consume them (it dequantizes in-kernel; other decode paths would
    # read raw int8 — see _can_scan_fused_decode)
    int8_kv = (
        cfg.int8_kv
        and scan_groups is not None
        and dense_stream.use_fused_decode(1, True)
        and dense_stream.fused_head_dim_ok(model.cfg.lm.head_dim)
    )
    cache = KVCache.create(
        model.cfg.lm, lang_x.shape[0], cache_len, dtype=model.dtype,
        scan_groups=scan_groups, int8=int8_kv,
    )
    # prefill; capture each xattn layer's projected media K/V so decode
    # steps skip the (static) media projection entirely.
    (logits, _, cache), variables = model.apply(
        params, None, lang_x, attention_mask, media_latents=latents,
        cache=cache, mutable=["media_kv"],
    )
    from .models.lm import extract_media_kv

    media_kv = extract_media_kv(variables, model.cfg.scan_layers)
    if int8_kv and media_kv is not None:
        from .models.decoders.common import (
            LayerKV,
            kv_scale_layout,
            quantize_kv,
        )

        def q_layer(l):
            kq, ks = quantize_kv(l.k)
            vq, vs = quantize_kv(l.v)
            return LayerKV(
                k=kq, v=vq,
                k_s=kv_scale_layout(ks), v_s=kv_scale_layout(vs),
            )

        media_kv = tuple(q_layer(l) for l in media_kv)
    cache = cache.replace(media=media_kv)
    first_logits = logits[:, -1]
    if k > 1:
        cache = _repeat_beams(cache, k)
        first_logits = jnp.repeat(first_logits, k, axis=0)

    def step_fn(tok, mask, cache):
        return model.apply(
            params,
            decode_latents,
            tok,
            mask,
            cache,
            n_media,
            method=Flamingo.decode_step,
        )

    # absorbed-ViT cross-batch pipelining: encode next_pixels inside
    # this batch's decode loop when the geometry carries the schedule
    absorb_plan = None
    if next_pixels is not None and k == 1:
        from .models.absorb_vit import make_plan

        if (
            scan_groups is not None
            and dense_stream.use_fused_decode(1, True)
            and dense_stream.fused_head_dim_ok(model.cfg.lm.head_dim)
        ):
            absorb_plan = make_plan(
                model.cfg, next_pixels.shape[:3], cfg.max_new_tokens,
                num_beams=k,
            )

    if absorb_plan is not None:
        from .models.absorb_vit import (
            finish_tokens,
            patch_embed_flat,
            side_step_tree,
        )

        venc = params["params"]["vision_encoder"]
        vp_steps = side_step_tree(params, absorb_plan, model.dtype)
        nb, nt, nf = next_pixels.shape[:3]
        xw0 = patch_embed_flat(
            model.cfg.vision, venc,
            next_pixels.reshape(nb * nt * nf, *next_pixels.shape[3:]),
            absorb_plan, model.dtype,
        )

        def absorb_step_fn(tok, mask, cache, xw, vp):
            return model.apply(
                params, decode_latents, tok, mask, cache, n_media,
                xw, vp, absorb_plan,
                method=Flamingo.decode_step_absorb,
            )

        tokens, xw_fin = greedy_absorb(
            step_fn, absorb_step_fn, first_logits, cache, cfg,
            xw0, vp_steps, absorb_plan.n_steps, rng,
        )
        next_tokens5 = finish_tokens(
            model.cfg.vision, venc, xw_fin, absorb_plan
        )
        next_latents = model.apply(
            params, next_tokens5, method=Flamingo.resample_vision
        )
        return tokens, next_latents

    if k > 1:
        out = beam_search(step_fn, first_logits, cache, cfg, prompt_len=t)
    else:
        out = greedy_or_sample(step_fn, first_logits, cache, cfg, rng)
    if next_pixels is not None:
        # geometry couldn't carry the schedule: serial fallback keeps
        # the (tokens, next_latents) contract
        next_latents = model.apply(
            params, next_pixels, method=Flamingo.embed_vision
        )
        return out, next_latents
    return out
