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
        m = self.model
        latents = m.apply(params, vision_x, method=Flamingo.embed_vision)
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

    def _admit_one(self, row: int, req: _Request):
        # left-pad the prompt into the fixed (1, P_max) window
        p = req.input_ids.shape[0]
        ids = np.zeros((1, self.p_max), np.int32)
        mask = np.zeros((1, self.p_max), np.int32)
        ids[0, self.p_max - p:] = req.input_ids
        mask[0, self.p_max - p:] = req.attention_mask
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

    def _admit_many(self, admits):
        """Admit several requests in ONE B-row prefill + ONE merge call.
        admits: list of (row, _Request). Dummy rows prefill zeros and
        are masked out of the merge."""
        first_vx = admits[0][1].vision_x
        ids = np.zeros((self.b, self.p_max), np.int32)
        mask = np.zeros((self.b, self.p_max), np.int32)
        vx = np.zeros((self.b,) + first_vx.shape, np.float32)
        admit_mask = np.zeros((self.b,), bool)
        for row, req in admits:
            p = req.input_ids.shape[0]
            ids[row, self.p_max - p:] = req.input_ids
            mask[row, self.p_max - p:] = req.attention_mask
            vx[row] = req.vision_x
            admit_mask[row] = True
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
            if len(admits) == 1:
                self._admit_one(*admits[0])
            elif admits:
                self._admit_many(admits)
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
