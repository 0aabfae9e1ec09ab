"""Speculative decoding: draft-model guesses, target-model verification.

A small draft Flamingo proposes `D` greedy tokens one at a time (cheap:
its weight stream is a fraction of the target's), then the target
verifies all of them in ONE multi-token forward — the target's weights
stream once per D+1 tokens instead of once per token, attacking the
same weight-DMA bound the int8 path halves. Verification is EXACT: the
emitted sequence is identical to the target's own greedy decode, token
for token, whatever the draft proposes (a bad draft only costs speed).

TPU-native shape discipline — everything is static:
  * the draft always runs D+1 single-token steps (the (D+1)-th step
    exists to write the last draft's K/V so full acceptance needs no
    catch-up path);
  * the verify window is always (B, D+1) tokens;
  * acceptance is lockstep across the batch (a* = min over sequences) —
    per-sequence ragged advance would need per-sequence cache slots.
    Sequences that accepted more simply re-derive those tokens next
    iteration, so exactness is preserved per sequence;
  * both caches roll back by setting `index` and masking `pad_mask` —
    rejected slots are overwritten by the next window.

Invariant at each iteration top: both caches hold K/V for every
committed token EXCEPT the newest (`last`), which is fed first.

Batched throughput serving should use the scan decode engine
(B>=8 is weight-stream-amortized already); speculative targets the
LATENCY regime (small B, long generations).

Replaced torch path: none — the reference decodes strictly one token
per forward (open_flamingo/src/flamingo.py:124-175).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .generation import GenerationConfig, _process_logits
from .models.decoders.common import KVCache
from .models.flamingo import Flamingo, count_media


def _prefill(model, params, vision_x, lang_x, attention_mask, cache_len,
             latents=None):
    """Vision encode + prompt prefill + media-KV capture for one model.
    Returns (last-position logits (B, V), cache, media latents).
    Pass `latents` to skip the vision encode (the draft reuses the
    target's — a mismatched draft only costs acceptance, not
    exactness, so sharing is always safe and halves the ViT work)."""
    from .models.lm import extract_media_kv

    if latents is None:
        latents = model.apply(params, vision_x, method=Flamingo.embed_vision)
    scan_groups = None
    if model.cfg.scan_layers:
        n = model.cfg.cross_attn_every_n or 1
        scan_groups = model.cfg.lm.num_layers // n
    cache = KVCache.create(
        model.cfg.lm, lang_x.shape[0], cache_len, dtype=model.dtype,
        scan_groups=scan_groups,
    )
    (logits, _, cache), variables = model.apply(
        params, None, lang_x, attention_mask, media_latents=latents,
        cache=cache, mutable=["media_kv"],
    )
    cache = cache.replace(
        media=extract_media_kv(variables, model.cfg.scan_layers)
    )
    return logits[:, -1], cache, latents


def _rollback(cache: KVCache, start, keep: jax.Array, window: int) -> KVCache:
    """Invalidate window slots beyond `keep`: index := start + keep and
    pad_mask cleared on [start+keep, start+window)."""
    s_max = cache.max_length
    slots = jnp.arange(s_max)[None, :]
    clear = (slots >= start + keep) & (slots < start + window)
    return cache.replace(
        index=start + keep, pad_mask=cache.pad_mask & ~clear
    )


def speculative_generate(
    model: Flamingo,
    params,
    draft_model: Flamingo,
    draft_params,
    vision_x: jax.Array,
    lang_x: jax.Array,
    attention_mask: jax.Array,
    cfg: GenerationConfig,
    num_draft_tokens: int = 4,
    return_stats: bool = False,
    media_latents: Optional[jax.Array] = None,
) -> jax.Array:
    """Greedy generate with draft speculation. Returns (B, max_new)
    ids — EXACTLY what flamingo_generate(model, ...) greedy returns.

    return_stats=True returns (ids, stats) with stats["iters"] = the
    number of draft+verify iterations run — max_new/iters is the mean
    committed tokens per target forward (acceptance+1, the speculative
    speedup's driver)."""
    assert not cfg.do_sample, "speculative decoding is greedy-only"
    assert cfg.num_beams == 1, "speculative decoding is greedy-only"
    # model-axis-sharded params must not reach the single-chip fused
    # decode kernels (same gate flamingo_generate applies). One call on
    # the combined tree: sharded if EITHER model is (tracer leaves are
    # skipped per-leaf inside params_model_sharded).
    from .ops import dense_stream

    if not all(
        isinstance(l, jax.core.Tracer)
        for l in jax.tree.leaves((params, draft_params))
    ):
        dense_stream.note_params_sharding((params, draft_params))

    # int4 decode side-cars: materialize the packed int4 stream
    # in-graph, once (see quantize.activate_int4_stream)
    from .quantize import activate_int4_stream

    params = activate_int4_stream(params)
    draft_params = activate_int4_stream(draft_params)

    D = num_draft_tokens
    b, t = lang_x.shape
    max_new = cfg.max_new_tokens
    pad = cfg.pad_token_id
    eos = cfg.eos_token_id
    # room for the last window's overshoot; fused-kernel S-block quantum
    cache_len = -(-(t + max_new + D + 1) // 16) * 16

    t_logits0, t_cache, t_latents = _prefill(
        model, params, vision_x, lang_x, attention_mask, cache_len,
        latents=media_latents,
    )
    # the draft reuses the target's latents: one ViT pass per generate
    # (exactness never depends on the draft's inputs)
    d_logits0, d_cache, d_latents = _prefill(
        draft_model, draft_params, vision_x, lang_x, attention_mask,
        cache_len, latents=t_latents,
    )
    n_media_t = count_media(lang_x, model.cfg.media_token_id)
    n_media_d = count_media(lang_x, draft_model.cfg.media_token_id)

    def t_step(tokens, cache):
        return model.apply(
            params, t_latents, tokens,
            jnp.ones(tokens.shape, jnp.int32), cache, n_media_t,
            method=Flamingo.decode_step,
        )

    def d_step(tokens, cache):
        return draft_model.apply(
            draft_params, d_latents, tokens,
            jnp.ones(tokens.shape, jnp.int32), cache, n_media_d,
            method=Flamingo.decode_step,
        )

    # first token comes from the target's prefill logits
    last0 = jnp.argmax(
        _process_logits(t_logits0, jnp.zeros((), jnp.int32), cfg), axis=-1
    ).astype(jnp.int32)
    finished0 = (
        (last0 == eos) if eos is not None else jnp.zeros((b,), bool)
    )
    out0 = jnp.full((b, max_new + D + 1), pad, jnp.int32)
    out0 = out0.at[:, 0].set(last0)

    def cond(carry):
        out, n, last, finished, t_cache, d_cache, iters = carry
        return (n < max_new) & ~jnp.all(finished)

    def body(carry):
        out, n, last, finished, t_cache, d_cache, iters = carry

        # --- draft phase: D+1 single-token steps, feds = [last, d1..dD]
        def draft_body(c, i):
            tok, cache = c
            logits, cache = d_step(tok[:, None], cache)
            nxt = jnp.argmax(
                _process_logits(logits[:, -1], n + i, cfg), axis=-1
            ).astype(jnp.int32)
            return (nxt, cache), tok

        (_, d_cache2), feds = jax.lax.scan(
            draft_body, (last, d_cache), jnp.arange(D + 1, dtype=jnp.int32)
        )
        feds = feds.T                                 # (B, D+1)

        # --- verify: one target forward over the whole window
        t_logits, t_cache2 = t_step(feds, t_cache)    # (B, D+1, V)

        greedy = []
        for j in range(1, D + 1):                     # target's token at pos n-1+j
            greedy.append(jnp.argmax(
                _process_logits(t_logits[:, j - 1], n - 1 + j, cfg), axis=-1
            ).astype(jnp.int32))
        greedy = jnp.stack(greedy, axis=1)            # (B, D)

        hits = feds[:, 1:] == greedy                  # (B, D)
        a_b = jnp.sum(jnp.cumprod(hits.astype(jnp.int32), axis=1), axis=1)
        # finished sequences emit pad regardless: don't let their garbage
        # drafts throttle the batch
        a_b = jnp.where(finished, D, a_b)
        a = jnp.min(a_b)                              # lockstep acceptance

        # bonus token: the target's greedy continuation after `a` drafts
        bonus_logits = jnp.take(t_logits, a, axis=1)   # (B, V)
        bonus = jnp.argmax(
            _process_logits(bonus_logits, n + a, cfg), axis=-1
        ).astype(jnp.int32)

        # --- emit [d1..d_a, bonus, pad...] with per-sequence EOS chain
        window = jnp.full((b, D + 1), pad, jnp.int32)
        fin = finished
        emitted_last = last
        for j in range(D + 1):
            raw = jnp.where(
                j < a, feds[:, min(j + 1, D)],
                jnp.where(j == a, bonus, jnp.full((b,), pad, jnp.int32)),
            )
            tok = jnp.where(fin | (j > a), pad, raw)
            if eos is not None:
                fin = fin | ((tok == eos) & (j <= a))
            # `last` = token at the final committed position n + a
            emitted_last = jnp.where(j == a, tok, emitted_last)
            window = window.at[:, j].set(tok)
        out = jax.lax.dynamic_update_slice(out, window, (0, n))

        # --- roll both caches back to the a+1 accepted window slots
        start = t + (n - 1)
        t_cache2 = _rollback(t_cache2, start, a + 1, D + 1)
        d_cache2 = _rollback(d_cache2, start, a + 1, D + 1)

        return (
            out, n + a + 1, emitted_last, fin, t_cache2, d_cache2,
            iters + 1,
        )

    init = (
        out0, jnp.ones((), jnp.int32), last0, finished0, t_cache, d_cache,
        jnp.zeros((), jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)
    out, iters = final[0], final[-1]
    if return_stats:
        return out[:, :max_new], {"iters": iters}
    return out[:, :max_new]
