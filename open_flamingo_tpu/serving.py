"""Continuous-batching serving engine (iteration-level scheduling).

Static-batch generation retires a whole batch at the speed of its
slowest sequence; a serving deployment instead keeps every cache row
busy: when a sequence finishes, a queued request is admitted into its
row while the other rows keep decoding. This engine does that with the
EXISTING decode machinery — no kernel changes — by exploiting two
properties of the cache design (models/decoders/common.py
make_attn_inputs):

  * positions are per-row (`prev_valid` = that row's pad_mask sum), so
    a row admitted at any global write slot sees its own 0-based
    logical positions — RoPE and the causal structure are exact;
  * the attend kernels mask by per-row pad_mask, so tenants never see
    each other's time slots, and one SCALAR write index (what the
    fused kernels take) can be shared by every row: each engine step
    advances the global slot by one for all rows.

Admission is therefore "dynamic left-padding": the new request's
prompt K/V (position-independent of the slot for RoPE; ALiBi distances
are slot-contiguous per row) is prefilled in a (1, P) call and copied
right-aligned so its last prompt token sits at slot `index - 1`; its
row's pad_mask marks exactly those slots valid. Everything stays
static-shaped and jit-compiled: one prefill graph, one admission
graph, one T-token decode-chunk graph.

Emitted tokens are EXACTLY flamingo_generate's greedy output for the
same request (tests/test_serving.py), whatever the admission order.

When the global slot would overflow max_seq_len the engine drains
(stops admitting) and resets the epoch: caches zero, index back to the
prompt window. Greedy-only (sampling state is per-request; batched
serving of sampled decodes belongs to the caller via seeds).

Replaced torch path: none — the reference generates static batches
only (open_flamingo/src/flamingo.py:124-175); this is the
production-serving layer on top.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict, deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .generation import GenerationConfig, _process_logits
from .models.decoders.common import KVCache, LayerKV
from .models.flamingo import Flamingo, count_media


@dataclasses.dataclass
class _Request:
    rid: int
    vision_x: np.ndarray        # (T_img, F, H, W, C)
    input_ids: np.ndarray       # (P,) int32
    attention_mask: np.ndarray  # (P,) int32
    max_new_tokens: int
    t_submit: float = 0.0       # perf_counter at submit (latency stats)


@dataclasses.dataclass
class _RowState:
    rid: int
    emitted: List[int]
    max_new: int
    done: bool = False
    horizon: int = 0      # slot index by which this tenant must retire
    retired: bool = False
    t_submit: float = 0.0
    t_first: float = 0.0  # wall time the first token was OBSERVED
    t_last: float = 0.0


def _row_update(x, row, val):
    """x[row] := val (row traced int32; val has x.shape[1:])."""
    return jax.lax.dynamic_update_slice(
        x, val[None].astype(x.dtype), (row,) + (0,) * (x.ndim - 1)
    )


class ServingEngine:
    """Fixed-shape continuous-batching server around one Flamingo model.

    batch_size rows x max_seq_len cache slots; prompts are padded to
    max_prompt_len (multiple of 16), decode runs in jitted
    chunk_tokens-step scans, and admission/retire bookkeeping happens
    between chunks on the host.
    """

    def __init__(
        self,
        model: Flamingo,
        params,
        *,
        batch_size: int,
        max_seq_len: int,
        max_prompt_len: int,
        t_img: int = 1,
        chunk_tokens: int = 8,
        gen: Optional[GenerationConfig] = None,
        pipeline_depth: int = 0,
        absorb_vision: bool = False,
        absorb_batch: Optional[int] = None,
    ):
        assert max_prompt_len % 16 == 0 and max_seq_len % 16 == 0
        assert max_prompt_len + chunk_tokens <= max_seq_len
        self.model = model
        self.params = params
        self.b = batch_size
        self.s_max = max_seq_len
        self.p_max = max_prompt_len
        self.t_img = t_img
        self.chunk = chunk_tokens
        # pipeline_depth > 0: keep up to that many decoded chunks
        # in flight before harvesting tokens on the host — the oldest
        # chunk's device->host read then overlaps the next chunk's
        # execution (and, over a remote tunnel, its dispatch latency).
        # Semantics per request are unchanged (tokens are routed by the
        # dispatch-time tenancy snapshot); the cost is that retires and
        # admissions are observed up to `depth` chunks late, so rows
        # re-fill slightly slower under churn. 0 = harvest every chunk
        # (fully serial, the round-3 behaviour).
        self.depth = int(pipeline_depth)
        self._pending: deque = deque()   # (toks_device, [row tenancy])
        self.gen = gen or GenerationConfig(max_new_tokens=0)
        assert not self.gen.do_sample and self.gen.num_beams == 1, (
            "serving engine is greedy-only"
        )
        cfg = model.cfg
        self._scan_groups = None
        if cfg.scan_layers:
            n = cfg.cross_attn_every_n or 1
            self._scan_groups = cfg.lm.num_layers // n
        # model-axis-sharded params must not reach the single-chip fused
        # decode kernels (same gate flamingo_generate applies)
        from .ops import dense_stream

        if not any(
            isinstance(l, jax.core.Tracer) for l in jax.tree.leaves(params)
        ):
            dense_stream.note_params_sharding(params)

        # int8 KV/media caches: same gate as flamingo_generate — only
        # where the scan fused engine consumes them (checked AFTER the
        # sharding note so use_fused_decode sees fresh state)
        self._int8_kv = (
            self.gen.int8_kv
            and self._scan_groups is not None
            and dense_stream.use_fused_decode(1, True)
            and dense_stream.fused_head_dim_ok(cfg.lm.head_dim)
        )

        self._queue: deque = deque()
        self._rows: List[Optional[_RowState]] = [None] * batch_size
        self._results: "OrderedDict[int, np.ndarray]" = OrderedDict()
        # per-request latency records {rid: {"ttft": s, "tpot": s,
        # "e2e": s, "n": tokens}} — observation times are harvest-side
        # wall clock, so pipeline_depth's delayed harvests are REAL
        # user-visible latency, not hidden
        self.latencies: Dict[int, Dict[str, float]] = {}
        self._next_rid = 0
        self._idx = 0           # host mirror of cache.index
        self._draining = False
        self.epochs = 0         # completed drain+reset cycles

        self._prefill_jit = jax.jit(self._prefill)
        self._admit_jit = jax.jit(self._admit, donate_argnums=(0,))
        self._admit_batch_jit = jax.jit(
            self._admit_batch, donate_argnums=(0,)
        )
        self._chunk_jit = jax.jit(self._decode_chunk, donate_argnums=(0,))
        self._state = None

        # absorbed-ViT pre-encode (models/absorb_vit.py): cycles of
        # `absorb_batch` queue-head images ride the decode chunks as
        # fused-kernel side tiles; admission then consumes the pooled
        # latents (bitwise-equal to embed_vision) through a prefill
        # graph that skips the vision encode. Requires the scan fused
        # decode engine (same gate as flamingo_generate's next_pixels).
        self._absorb_on = bool(absorb_vision) and (
            self._scan_groups is not None
            and dense_stream.use_fused_decode(1, True)
            and dense_stream.fused_head_dim_ok(cfg.lm.head_dim)
        )
        self._abs_bpre = absorb_batch or batch_size
        self._abs_plan = None        # built lazily from pixel geometry
        self._abs_vp = None          # stacked ViT side params (device)
        self._abs_xw = None          # active cycle's flat workspace
        self._abs_done = 0           # absorbed steps this cycle
        self._abs_rids: List[int] = []
        self._abs_seen: set = set()  # rids encoded or in-flight
        self._lat_pool: Dict[int, jax.Array] = {}
        self.absorb_hits = 0         # admissions served from the pool
        self.absorb_misses = 0       # admissions that re-ran the ViT
        self._patch_jit = jax.jit(self._abs_patch_embed)
        self._finish_jit = jax.jit(self._abs_finish)
        self._prefill_lat_jit = jax.jit(self._prefill_latents)
        self._chunk_abs_jit = jax.jit(
            self._decode_chunk_absorb, donate_argnums=(0, 2),
            static_argnames=("n_abs",),
        )

    # --- jitted graphs ------------------------------------------------------

    def _fresh_state(self):
        """Zeroed engine state; global index starts at p_max so the
        first admissions have a full prompt window behind them."""
        m = self.model
        cache = KVCache.create(
            m.cfg.lm, self.b, self.s_max, dtype=m.dtype,
            scan_groups=self._scan_groups, int8=self._int8_kv,
        )
        # KVCache.create aliases one zeros array across layers; the
        # donated admission graph needs each buffer unique
        cache = jax.tree.map(lambda x: x.copy(), cache)
        cache = cache.replace(index=jnp.asarray(self.p_max, jnp.int32))
        # media cache rows are admitted per-request; build the container
        # by running one throwaway (B-row) prefill? No: shape it from a
        # single-row prefill at first admission (lazy).
        return {
            "cache": cache,
            "media": None,          # tuple[LayerKV] once first admitted
            "latents": None,        # (B, T_img, n_lat, D)
            "n_media": jnp.zeros((self.b,), jnp.int32),
            "logits": None,         # (B, V) pending logits
            "finished": jnp.ones((self.b,), bool),
            "step": jnp.zeros((self.b,), jnp.int32),
        }

    def _prefill(self, params, vision_x, ids, mask):
        """(R, P_max) prompts -> (last logits (R, V), prompt LayerKVs,
        media LayerKVs, latents (R, T_img, n_lat, D), pad rows (R, P)).
        R=1 for single admissions; R=batch_size for the batched
        admission path (one vision+prefill forward for every free row —
        serialized 1-row prefills were the engine's dominant cost under
        churn, BASELINE.md round 4)."""
        latents = self.model.apply(
            params, vision_x, method=Flamingo.embed_vision
        )
        return self._prefill_tail(params, latents, ids, mask)

    def _prefill_latents(self, params, latents, ids, mask):
        """_prefill with the vision encode skipped: `latents` come from
        the absorbed-ViT pre-encode pool (bitwise-equal to embed_vision
        on the same pixels — models/absorb_vit.py), so admission tokens
        are unchanged."""
        return self._prefill_tail(
            params, latents.astype(self.model.dtype), ids, mask
        )

    def _prefill_tail(self, params, latents, ids, mask):
        m = self.model
        cache = KVCache.create(
            m.cfg.lm, ids.shape[0], self.p_max, dtype=m.dtype,
            scan_groups=self._scan_groups, int8=self._int8_kv,
        )
        (logits, _, cache), variables = m.apply(
            params, None, ids, mask, media_latents=latents, cache=cache,
            mutable=["media_kv"],
        )
        from .models.lm import extract_media_kv

        media = extract_media_kv(variables, m.cfg.scan_layers)
        if self._int8_kv and media is not None:
            from .models.decoders.common import kv_scale_layout, quantize_kv

            def q_layer(l):
                kq, ks = quantize_kv(l.k)
                vq, vs = quantize_kv(l.v)
                return LayerKV(
                    k=kq, v=vq,
                    k_s=kv_scale_layout(ks), v_s=kv_scale_layout(vs),
                )

            media = tuple(q_layer(l) for l in media)
        return (
            logits[:, -1], cache.layers, media, latents,
            cache.pad_mask,
        )

    def _admit(self, state, row, pre_layers, pre_media, pre_latents,
               pre_pad, first_logits, n_media_row):
        """Merge a prefilled request into `row`, right-aligned so its
        last prompt token sits at slot index-1."""
        cache = state["cache"]
        start = cache.index - self.p_max
        stacked = self._scan_groups is not None

        def merge(big, pre):
            if big is None or pre is None:
                return None
            if stacked:   # (G, B, H, S, D) <- (G, 1, H, P, D)
                return jax.lax.dynamic_update_slice(
                    big, pre.astype(big.dtype), (0, row, 0, start, 0)
                )
            return jax.lax.dynamic_update_slice(
                big, pre.astype(big.dtype), (row, 0, start, 0)
            )

        def merge_scale(big, pre):
            # head-leading int8-cache scales: (H, B, S) <- (H, 1, P)
            # (stacked: (G, H, B, S) <- (G, H, 1, P))
            if big is None or pre is None:
                return None
            if stacked:
                return jax.lax.dynamic_update_slice(
                    big, pre, (0, 0, row, start)
                )
            return jax.lax.dynamic_update_slice(big, pre, (0, row, start))

        def merge_layer(big, pre):
            return LayerKV(
                k=merge(big.k, pre.k), v=merge(big.v, pre.v),
                k_s=merge_scale(big.k_s, pre.k_s),
                v_s=merge_scale(big.v_s, pre.v_s),
            )

        layers = tuple(
            merge_layer(bl, pl) for bl, pl in zip(cache.layers, pre_layers)
        )
        # row pad mask: zeros except the admitted window
        pad_row = jnp.zeros((self.s_max,), bool)
        pad_row = jax.lax.dynamic_update_slice(pad_row, pre_pad, (start,))
        pad_mask = _row_update(cache.pad_mask, row, pad_row)
        cache = cache.replace(layers=layers, pad_mask=pad_mask)

        def merge_media(big, pre):
            # media K/V is per-row static: (B, H, S_m, D) <- (1, ...)
            # (stacked: (G, B, H, S_m, D))
            if big is None or pre is None:
                return None
            if stacked:
                return jax.lax.dynamic_update_slice(
                    big, pre.astype(big.dtype), (0, row, 0, 0, 0)
                )
            return jax.lax.dynamic_update_slice(
                big, pre.astype(big.dtype), (row, 0, 0, 0)
            )

        def merge_media_scale(big, pre):
            # (H, B, S_m) <- (H, 1, S_m) (stacked: leading G)
            if big is None or pre is None:
                return None
            if stacked:
                return jax.lax.dynamic_update_slice(big, pre, (0, 0, row, 0))
            return jax.lax.dynamic_update_slice(big, pre, (0, row, 0))

        media = state["media"]
        if pre_media is not None:
            media = tuple(
                LayerKV(
                    k=merge_media(b.k, p.k), v=merge_media(b.v, p.v),
                    k_s=merge_media_scale(b.k_s, p.k_s),
                    v_s=merge_media_scale(b.v_s, p.v_s),
                )
                for b, p in zip(media, pre_media)
            )
        return {
            "cache": cache,
            "media": media,
            "latents": _row_update(state["latents"], row, pre_latents[0]),
            "n_media": state["n_media"].at[row].set(n_media_row),
            "logits": _row_update(state["logits"], row, first_logits[0]),
            "finished": state["finished"].at[row].set(False),
            "step": state["step"].at[row].set(0),
        }

    def _admit_batch(self, state, admit_mask, pre_layers, pre_media,
                     pre_latents, pre_pad, first_logits, n_media):
        """Merge a (B-row) batched prefill into every row where
        admit_mask is True — ONE jitted call instead of per-row
        prefill+admit pairs. Row r of every pre_* tensor is aligned to
        engine row r (dummy rows carry zeros and are masked out)."""
        cache = state["cache"]
        start = cache.index - self.p_max
        stacked = self._scan_groups is not None
        b_ax_kv = 1 if stacked else 0   # row axis in K/V tensors
        b_ax_sc = 2 if stacked else 1   # row axis in scale tensors

        def rowmask(x, axis):
            shape = [1] * x.ndim
            shape[axis] = self.b
            return admit_mask.reshape(shape)

        def merge(big, pre):
            if big is None or pre is None:
                return None
            idx = [0] * big.ndim
            idx[big.ndim - 2] = start      # (..., S, D): S is -2
            tmp = jax.lax.dynamic_update_slice(
                big, pre.astype(big.dtype), tuple(idx)
            )
            return jnp.where(rowmask(big, b_ax_kv), tmp, big)

        def merge_scale(big, pre):
            if big is None or pre is None:
                return None
            idx = [0] * big.ndim
            idx[-1] = start                # (..., B, S): S is last
            tmp = jax.lax.dynamic_update_slice(big, pre, tuple(idx))
            return jnp.where(rowmask(big, b_ax_sc), tmp, big)

        layers = tuple(
            LayerKV(
                k=merge(bl.k, pl.k), v=merge(bl.v, pl.v),
                k_s=merge_scale(bl.k_s, pl.k_s),
                v_s=merge_scale(bl.v_s, pl.v_s),
            )
            for bl, pl in zip(cache.layers, pre_layers)
        )
        window = jax.lax.dynamic_update_slice(
            jnp.zeros((self.b, self.s_max), bool), pre_pad, (0, start)
        )
        pad_mask = jnp.where(admit_mask[:, None], window, cache.pad_mask)
        cache = cache.replace(layers=layers, pad_mask=pad_mask)

        media = state["media"]
        if pre_media is not None:
            def m_kv(big, pre):
                if big is None or pre is None:
                    return None
                return jnp.where(
                    rowmask(big, b_ax_kv), pre.astype(big.dtype), big
                )

            def m_sc(big, pre):
                if big is None or pre is None:
                    return None
                return jnp.where(rowmask(big, b_ax_sc), pre, big)

            media = tuple(
                LayerKV(k=m_kv(b.k, p.k), v=m_kv(b.v, p.v),
                        k_s=m_sc(b.k_s, p.k_s), v_s=m_sc(b.v_s, p.v_s))
                for b, p in zip(media, pre_media)
            )
        lat_mask = admit_mask.reshape((self.b,) + (1,) * (
            state["latents"].ndim - 1))
        return {
            "cache": cache,
            "media": media,
            "latents": jnp.where(lat_mask, pre_latents, state["latents"]),
            "n_media": jnp.where(admit_mask, n_media, state["n_media"]),
            "logits": jnp.where(
                admit_mask[:, None], first_logits, state["logits"]
            ),
            "finished": jnp.where(admit_mask, False, state["finished"]),
            "step": jnp.where(admit_mask, 0, state["step"]),
        }

    def _decode_chunk(self, state, params):
        """chunk_tokens greedy steps for every row. Token semantics are
        exactly generation.greedy_or_sample's (pad after EOS, per-row
        step counter for min_new_tokens)."""
        from .quantize import activate_int4_stream

        m, cfg = self.model, self.gen
        # int4 decode: in-graph, loop-invariant within the chunk (see
        # activate_int4_stream). The cast RECURS once per chunk — S4
        # arrays cannot cross the jit->jit boundary on this backend
        # even device-resident (RecursionError, reproduced by
        # scripts_dev/tpu_s4_boundary_probe.py), so hoisting it into
        # engine state is impossible; raise chunk_tokens to amortize
        # (~1.1 GB re-cast per chunk for OF-3B).
        params = activate_int4_stream(params)

        def step_fn(tok, mask, cache):
            return m.apply(
                params, state["latents"], tok, mask,
                cache.replace(media=state["media"]), state["n_media"],
                method=Flamingo.decode_step,
            )

        def body(carry, _):
            logits, cache, finished, step = carry
            # per-row step vector broadcasts through _process_logits'
            # (step < min_new) comparison — same semantics per row
            logits = _process_logits(logits, step[:, None], cfg)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            if cfg.eos_token_id is not None:
                tok = jnp.where(finished, cfg.pad_token_id, tok)
                finished = finished | (tok == cfg.eos_token_id)
            new_logits, cache = step_fn(
                tok[:, None], jnp.ones((self.b, 1), jnp.int32), cache
            )
            # media is engine state, not cache state (rows swap tenants)
            cache = cache.replace(media=None)
            return (new_logits[:, 0], cache, finished, step + 1), tok

        init = (
            state["logits"], state["cache"].replace(media=None),
            state["finished"], state["step"],
        )
        (logits, cache, finished, step), toks = jax.lax.scan(
            body, init, None, length=self.chunk
        )
        out = dict(
            state, logits=logits, cache=cache, finished=finished, step=step
        )
        return out, toks.T      # (B, chunk)

    # --- absorbed-ViT pre-encode graphs --------------------------------------

    def _abs_patch_embed(self, params, pixels):
        """(b_pre*t*f, H, W, C) pixels -> the flat padded ViT workspace
        the side schedule streams (absorb_vit.patch_embed_flat)."""
        from .models.absorb_vit import patch_embed_flat

        venc = params["params"]["vision_encoder"]
        return patch_embed_flat(
            self.model.cfg.vision, venc,
            pixels.astype(self.model.dtype), self._abs_plan,
            self.model.dtype,
        )

    def _abs_finish(self, params, xw):
        """Workspace after the full cycle -> (b_pre, T_img, n_lat, D)
        perceiver latents (finish_tokens + resample_vision — the same
        back half flamingo_generate's absorbed path runs)."""
        from .models.absorb_vit import finish_tokens

        venc = params["params"]["vision_encoder"]
        toks5 = finish_tokens(
            self.model.cfg.vision, venc, xw, self._abs_plan
        )
        return self.model.apply(
            params, toks5, method=Flamingo.resample_vision
        )

    def _decode_chunk_absorb(self, state, params, xw, vp_full, off,
                             *, n_abs: int):
        """_decode_chunk whose first n_abs steps each carry one macro
        slice of the pre-encode cycle's ViT side schedule (n_abs is
        static: at most two values compile — full chunks and the cycle
        tail). Token semantics are BIT-IDENTICAL to _decode_chunk (side
        tiles never touch the main kernels' outputs). Returns
        (state, toks (B, chunk), new workspace)."""
        from .quantize import activate_int4_stream

        m, cfg, plan = self.model, self.gen, self._abs_plan
        params = activate_int4_stream(params)
        vp = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, off, n_abs, 0),
            vp_full,
        )

        def make_body(absorb: bool):
            def body(carry, xs):
                logits, cache, finished, step, xw = carry
                logits = _process_logits(logits, step[:, None], cfg)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                if cfg.eos_token_id is not None:
                    tok = jnp.where(finished, cfg.pad_token_id, tok)
                    finished = finished | (tok == cfg.eos_token_id)
                mask = jnp.ones((self.b, 1), jnp.int32)
                cache = cache.replace(media=state["media"])
                if absorb:
                    new_logits, cache, xw = m.apply(
                        params, state["latents"], tok[:, None], mask,
                        cache, state["n_media"], xw, xs, plan,
                        method=Flamingo.decode_step_absorb,
                    )
                else:
                    new_logits, cache = m.apply(
                        params, state["latents"], tok[:, None], mask,
                        cache, state["n_media"],
                        method=Flamingo.decode_step,
                    )
                cache = cache.replace(media=None)
                return (
                    new_logits[:, 0], cache, finished, step + 1, xw
                ), tok
            return body

        init = (
            state["logits"], state["cache"].replace(media=None),
            state["finished"], state["step"], xw,
        )
        carry, toks = jax.lax.scan(make_body(True), init, vp, length=n_abs)
        if n_abs < self.chunk:
            carry, toks_b = jax.lax.scan(
                make_body(False), carry, None, length=self.chunk - n_abs
            )
            toks = jnp.concatenate([toks, toks_b], axis=0)
        logits, cache, finished, step, xw = carry
        out = dict(
            state, logits=logits, cache=cache, finished=finished, step=step
        )
        return out, toks.T, xw

    # --- absorbed-ViT cycle bookkeeping (host) --------------------------------

    def _abs_maybe_start(self):
        """Open a pre-encode cycle over the next un-encoded queue-head
        requests (patch-embed them into a fresh workspace). The first
        cycle fixes the plan from the request pixel geometry; a geometry
        the schedule can't carry turns the feature off (silent serial
        fallback, same contract as flamingo_generate next_pixels=)."""
        if not self._absorb_on or self._abs_xw is not None:
            return
        cands = [
            r for r in self._queue if r.rid not in self._abs_seen
        ][: self._abs_bpre]
        if not cands:
            return
        if self._abs_plan is None:
            from .models.absorb_vit import make_plan

            f = int(cands[0].vision_x.shape[1])
            plan = make_plan(
                self.model.cfg, (self._abs_bpre, self.t_img, f),
                max_new_tokens=10 ** 9,
            )
            if plan is None:
                self._absorb_on = False
                return
            self._abs_plan = plan
        if self._abs_vp is None:
            from .models.absorb_vit import side_step_tree

            self._abs_vp = side_step_tree(
                self.params, self._abs_plan, self.model.dtype
            )
        p = self._abs_plan
        px = np.zeros((p.b,) + cands[0].vision_x.shape, np.float32)
        for i, r in enumerate(cands):
            px[i] = r.vision_x
            self._abs_seen.add(r.rid)
        self._abs_rids = [r.rid for r in cands]
        self._abs_done = 0
        self._abs_xw = self._patch_jit(
            self.params,
            jnp.asarray(px.reshape((p.bv,) + px.shape[3:]),
                        self.model.dtype),
        )

    def _abs_harvest_cycle(self):
        """Finish a completed cycle: workspace -> perceiver latents,
        one pool entry per still-pending rid."""
        lat = self._finish_jit(self.params, self._abs_xw)
        for i, rid in enumerate(self._abs_rids):
            if rid not in self._abs_seen:
                continue   # admitted mid-cycle via the pixel path
            self._lat_pool[rid] = lat[i]
        self._abs_xw = None
        self._abs_done = 0
        self._abs_rids = []

    def _abs_pool_take(self, admits):
        """{rid: (T_img, n_lat, D) latents} for an admission wave, or
        None when any admitted rid lacks a pool entry (that wave then
        re-runs the vision encode — all-or-nothing keeps the prefill
        graphs static). Pool/cycle state for admitted rids is dropped
        either way."""
        if not self._absorb_on and not self._lat_pool:
            return None
        hit = bool(self._lat_pool) and all(
            req.rid in self._lat_pool for _, req in admits
        )
        out = None
        if hit:
            out = {req.rid: self._lat_pool[req.rid] for _, req in admits}
            self.absorb_hits += len(admits)
        elif self._absorb_on:
            self.absorb_misses += len(admits)
        for _, req in admits:
            self._lat_pool.pop(req.rid, None)
            # mid-cycle admits: drop the harvest for this rid
            self._abs_seen.discard(req.rid)
        return out

    # --- host API ------------------------------------------------------------

    def submit(self, vision_x, input_ids, attention_mask=None,
               max_new_tokens: int = 32) -> int:
        """Enqueue one request. vision_x: (T_img, F, H, W, C) pixels;
        input_ids/attention_mask: (P,) with P <= max_prompt_len."""
        ids = np.asarray(input_ids, np.int32)
        assert ids.shape[0] <= self.p_max
        vision_x = np.asarray(vision_x)
        assert vision_x.shape[0] == self.t_img, (
            f"vision_x must carry t_img={self.t_img} media slots, "
            f"got {vision_x.shape[0]} (fixed per engine)"
        )
        chunks = -(-max_new_tokens // self.chunk)
        assert self.p_max + chunks * self.chunk <= self.s_max, (
            f"max_new_tokens={max_new_tokens} cannot fit an epoch: "
            f"p_max + ceil(max_new/chunk)*chunk > max_seq_len"
        )
        mask = (np.ones_like(ids) if attention_mask is None
                else np.asarray(attention_mask, np.int32))
        rid = self._next_rid
        self._next_rid += 1
        import time

        self._queue.append(_Request(
            rid, np.asarray(vision_x), ids, mask, max_new_tokens,
            t_submit=time.perf_counter(),
        ))
        return rid

    def _admit_one(self, row: int, req: _Request, lat=None):
        # left-pad the prompt into the fixed (1, P_max) window
        p = req.input_ids.shape[0]
        ids = np.zeros((1, self.p_max), np.int32)
        mask = np.zeros((1, self.p_max), np.int32)
        ids[0, self.p_max - p:] = req.input_ids
        mask[0, self.p_max - p:] = req.attention_mask
        if lat is not None:   # pre-encoded latents from the absorb pool
            logits, layers, media, latents, pad = self._prefill_lat_jit(
                self.params, lat[req.rid][None],
                jnp.asarray(ids), jnp.asarray(mask),
            )
        else:
            vx = jnp.asarray(req.vision_x[None], self.model.dtype)
            logits, layers, media, latents, pad = self._prefill_jit(
                self.params, vx, jnp.asarray(ids), jnp.asarray(mask)
            )
        pad_row = pad[0]
        if self._state["media"] is None and media is not None:
            # first admission shapes the engine media/latent containers
            stacked = self._scan_groups is not None

            def widen(x, ax, fill=0):
                if x is None:
                    return None
                shape = list(x.shape)
                shape[ax] = self.b
                return jnp.full(shape, fill, x.dtype)

            kv_ax = 1 if stacked else 0
            sc_ax = 2 if stacked else 1   # head-leading scale layout
            self._state["media"] = tuple(
                LayerKV(
                    k=widen(l.k, kv_ax), v=widen(l.v, kv_ax),
                    k_s=widen(l.k_s, sc_ax, fill=1),
                    v_s=widen(l.v_s, sc_ax, fill=1),
                )
                for l in media
            )
        if self._state["latents"] is None:
            z = jnp.zeros_like(latents[0])
            self._state["latents"] = jnp.tile(z[None], (self.b, 1, 1, 1))
            self._state["logits"] = jnp.zeros(
                (self.b, logits.shape[-1]), logits.dtype
            )
        n_media = count_media(
            jnp.asarray(ids), self.model.cfg.media_token_id
        )[0]
        self._state = self._admit_jit(
            self._state, jnp.asarray(row, jnp.int32), layers, media,
            latents, pad_row, logits, n_media,
        )
        self._rows[row] = _RowState(
            req.rid, [], req.max_new_tokens,
            horizon=self._horizon(req.max_new_tokens),
            t_submit=req.t_submit,
        )

    def _admit_many(self, admits, lat=None):
        """Admit several requests in ONE B-row prefill + ONE merge call.
        admits: list of (row, _Request). Dummy rows prefill zeros and
        are masked out of the merge. `lat` ({rid: latents row}) routes
        the wave through the vision-skipping prefill graph."""
        first_vx = admits[0][1].vision_x
        ids = np.zeros((self.b, self.p_max), np.int32)
        mask = np.zeros((self.b, self.p_max), np.int32)
        vx = np.zeros((self.b,) + first_vx.shape, np.float32)
        admit_mask = np.zeros((self.b,), bool)
        row_rid = {}
        for row, req in admits:
            p = req.input_ids.shape[0]
            ids[row, self.p_max - p:] = req.input_ids
            mask[row, self.p_max - p:] = req.attention_mask
            vx[row] = req.vision_x
            admit_mask[row] = True
            row_rid[row] = req.rid
        if lat is not None:   # pre-encoded latents from the absorb pool
            zero = jnp.zeros_like(next(iter(lat.values())))
            lat_b = jnp.stack(
                [
                    lat[row_rid[r]] if r in row_rid else zero
                    for r in range(self.b)
                ],
                axis=0,
            )
            logits, layers, media, latents, pad = self._prefill_lat_jit(
                self.params, lat_b, jnp.asarray(ids), jnp.asarray(mask),
            )
        else:
            logits, layers, media, latents, pad = self._prefill_jit(
                self.params, jnp.asarray(vx, self.model.dtype),
                jnp.asarray(ids), jnp.asarray(mask),
            )
        if self._state["media"] is None and media is not None:
            # batched prefill outputs are already B-row: containers are
            # zero copies of them (scales fill 1)
            self._state["media"] = tuple(
                LayerKV(
                    k=jnp.zeros_like(l.k), v=jnp.zeros_like(l.v),
                    k_s=None if l.k_s is None else jnp.ones_like(l.k_s),
                    v_s=None if l.v_s is None else jnp.ones_like(l.v_s),
                )
                for l in media
            )
        if self._state["latents"] is None:
            self._state["latents"] = jnp.zeros_like(latents)
            self._state["logits"] = jnp.zeros(
                (self.b, logits.shape[-1]), logits.dtype
            )
        n_media = count_media(
            jnp.asarray(ids), self.model.cfg.media_token_id
        )
        self._state = self._admit_batch_jit(
            self._state, jnp.asarray(admit_mask), layers, media,
            latents, pad, logits, n_media,
        )
        for row, req in admits:
            self._rows[row] = _RowState(
                req.rid, [], req.max_new_tokens,
                horizon=self._horizon(req.max_new_tokens),
                t_submit=req.t_submit,
            )

    def _harvest_one(self):
        """Read the OLDEST in-flight chunk's tokens and do its host
        bookkeeping. Tokens are routed by the tenancy snapshot taken at
        dispatch time: if a row was re-tenanted since (retire + admit
        observed between dispatch and harvest is impossible, but the
        same _RowState object may have retired), pads emitted for a
        finished tenant can never leak into the next tenant's stream."""
        import time

        toks_dev, snap = self._pending.popleft()
        toks = np.asarray(toks_dev)
        now = time.perf_counter()
        eos = self.gen.eos_token_id
        for row in range(self.b):
            rs = snap[row]
            if rs is None:
                continue
            for t in toks[row]:
                if len(rs.emitted) < rs.max_new and not rs.done:
                    rs.emitted.append(int(t))
                    if rs.t_first == 0.0:
                        rs.t_first = now
                    rs.t_last = now
                    if eos is not None and int(t) == eos:
                        rs.done = True
            if not rs.retired and (
                rs.done or len(rs.emitted) >= rs.max_new
            ):
                rs.retired = True
                n_out = min(len(rs.emitted), rs.max_new)
                self._results[rs.rid] = np.asarray(
                    rs.emitted[:n_out], np.int32
                )
                ttft = rs.t_first - rs.t_submit
                self.latencies[rs.rid] = {
                    "ttft_s": ttft,
                    "tpot_s": (
                        (rs.t_last - rs.t_first) / (n_out - 1)
                        if n_out > 1 else 0.0
                    ),
                    "e2e_s": rs.t_last - rs.t_submit,
                    "n": n_out,
                }
                if self._rows[row] is rs:
                    self._rows[row] = None

    def _flush(self):
        while self._pending:
            self._harvest_one()

    def _horizon(self, max_new: int) -> int:
        """Slot index by which a tenant admitted NOW must have retired.
        The slot-overflow safety proof (dispatch assert in step()) rests
        on _fits using THIS expression — shared helper so the admission
        check and the dispatch guard cannot drift apart."""
        return self._idx + (-(-max_new // self.chunk)) * self.chunk

    def _fits(self, max_new: int) -> bool:
        """A request admitted at the current slot index is live for at
        most ceil(max_new / chunk) chunks; it fits iff that horizon
        stays inside the cache."""
        return self._horizon(max_new) <= self.s_max

    def step(self) -> bool:
        """Admit, decode one chunk, harvest/retire. Returns True while
        there is (or will be) work in flight."""
        # epoch reset once drained (needs the pipeline empty so every
        # retire has been observed). Only force the flush once no row
        # is visibly live — an unconditional flush here would zero the
        # pipeline depth for the whole drain tail even while live rows
        # are still decoding (the harvest-lag guard below already
        # flushes once no tenant can need more tokens).
        if self._draining and not any(r is not None for r in self._rows):
            self._flush()
        if self._draining and all(r is None for r in self._rows):
            self._state = self._fresh_state()
            self._idx = self.p_max
            self._draining = False
            self.epochs += 1
        if self._state is None:
            self._state = self._fresh_state()
            self._idx = self.p_max
        if not self._draining:
            admits = []
            for row in range(self.b):
                if self._rows[row] is None and self._queue:
                    # admission-time horizon check: every live row must
                    # retire before the slot index reaches max_seq_len
                    # (decoding past it would clamp K/V writes onto the
                    # last slot and corrupt every row)
                    if not self._fits(self._queue[0].max_new_tokens):
                        self._draining = True
                        break
                    admits.append((row, self._queue.popleft()))
            if admits:
                lat = self._abs_pool_take(admits)
                if len(admits) == 1:
                    self._admit_one(*admits[0], lat=lat)
                else:
                    self._admit_many(admits, lat=lat)
        if all(r is None for r in self._rows) and not self._pending:
            if self._queue:
                self._draining = True   # nothing live: reset next step
                return True
            return False
        # harvest-lag guard: only dispatch while some tenant can still
        # need tokens (self._idx < its horizon). Without this, retires
        # observed `depth` chunks late would keep dispatching pad-only
        # chunks and push the slot index past max_seq_len.
        if not any(
            rs is not None and self._idx < rs.horizon for rs in self._rows
        ):
            self._flush()
            return bool(self._queue) or any(
                r is not None for r in self._rows
            )
        assert self._idx + self.chunk <= self.s_max, (
            "engine invariant: live rows always fit (admission horizon)"
        )
        self._abs_maybe_start()
        if self._abs_xw is not None:
            n_abs = min(
                self.chunk, self._abs_plan.n_steps - self._abs_done
            )
            self._state, toks, self._abs_xw = self._chunk_abs_jit(
                self._state, self.params, self._abs_xw, self._abs_vp,
                jnp.asarray(self._abs_done, jnp.int32), n_abs=n_abs,
            )
            self._abs_done += n_abs
            if self._abs_done >= self._abs_plan.n_steps:
                self._abs_harvest_cycle()
        else:
            self._state, toks = self._chunk_jit(self._state, self.params)
        self._pending.append((toks, list(self._rows)))
        self._idx += self.chunk
        # deterministic horizon re-tenancy: once the slot index reaches
        # a tenant's horizon it CANNOT receive tokens from any future
        # chunk (the dispatch guard above uses the same expression), so
        # its row frees for re-admission NOW instead of `depth` chunks
        # later when the harvest observes the retire. Its tokens still
        # land via the dispatch-time snapshots; EOS-early retires are
        # still discovered at harvest (host can't see tokens sooner).
        for row, rs in enumerate(self._rows):
            if rs is not None and self._idx >= rs.horizon:
                self._rows[row] = None
        while len(self._pending) > self.depth:
            self._harvest_one()
        return bool(self._queue) or any(
            r is not None for r in self._rows
        ) or bool(self._pending)

    def run(self) -> Dict[int, np.ndarray]:
        """Serve until the queue drains; returns {rid: generated ids}."""
        while self.step():
            pass
        out, self._results = self._results, OrderedDict()
        return out

    def latency_stats(self) -> Dict[str, float]:
        """p50/p99 TTFT and TPOT over every retired request (seconds,
        harvest-observed — pipeline depth's delayed reads count as real
        latency). Empty dict before the first retire."""
        if not self.latencies:
            return {}
        recs = list(self.latencies.values())

        def pct(key, q):
            vals = sorted(r[key] for r in recs)
            i = min(len(vals) - 1, int(round(q * (len(vals) - 1))))
            return vals[i]

        return {
            "n_requests": len(recs),
            "ttft_p50_s": round(pct("ttft_s", 0.50), 4),
            "ttft_p99_s": round(pct("ttft_s", 0.99), 4),
            "tpot_p50_s": round(pct("tpot_s", 0.50), 5),
            "tpot_p99_s": round(pct("tpot_s", 0.99), 5),
            "e2e_p50_s": round(pct("e2e_s", 0.50), 4),
            "e2e_p99_s": round(pct("e2e_s", 0.99), 4),
        }
