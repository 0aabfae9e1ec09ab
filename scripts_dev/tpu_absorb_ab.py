"""Integrated absorbed-ViT A/B on the real OF-3B geometry (round 5).

Steady-state pipelined serving: batch i's generate carries batch i+1's
ViT as side tiles (flamingo_generate(media_latents=..., next_pixels=...))
vs today's serial per-batch vision+prefill+decode. Per-batch time is the
whole jitted call (the only trustworthy timing over the tunnel).

Arms (B=32, prompt 32, new 32):
  serial:   generate(vision_x)                      — today's path
  absorb:   generate(media_latents, next_pixels)    — pipelined path
Both for bf16 and int4+W8A8 stacks. Parity gates:
  * tokens(absorb) == tokens(media_latents only)    — exact
  * absorbed latents vs embed_vision latents        — bf16 rounding
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses

from open_flamingo_tpu.configs import flamingo_config
from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.models.absorb_vit import make_plan
from open_flamingo_tpu.ops import w8a8
from open_flamingo_tpu.quantize import quantize_prefill_params

T_TXT, NEW = 32, 32

cfg = flamingo_config("OF-3B")
model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)
plan = make_plan(
    dataclasses.replace(cfg, scan_layers=True), (32, 1, 1), NEW
)
print(f"plan: {plan}", file=sys.stderr, flush=True)
assert plan is not None

rng = np.random.default_rng(0)
_vx1 = jnp.zeros((1, 1, 1, 224, 224, 3), jnp.bfloat16)
_i1 = jnp.zeros((1, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
_m1 = jnp.ones((1, T_TXT), jnp.int32)
shapes = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), _vx1, _i1, _m1)
)
params_bf16 = jax.jit(
    lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
)()


def timed(fn, *args, reps=9, w8=False):
    """median of 9 — the overhead numbers are differences of ~350ms
    arms, so per-arm noise must stay well under the ~10-50ms deltas."""
    if w8:
        w8a8.ENABLED = True
    np.asarray(jax.tree.leaves(fn(*args))[0])
    w8a8.ENABLED = False
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0])
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


ARMS = {
    # (quantized stack, batch, attn_carriers)
    "bf16_b32": (False, 32, False),
    "int4w8a8_b32": (True, 32, False),
    "int4w8a8_b8": (True, 8, False),
    "bf16_b8": (False, 8, False),
    # round-5 second wave: attention-block launches join the carrier
    # set (absorb_vit.ATTN_CARRIERS) — the attn launches stream the
    # whole KV cache, so their per-grid-step DMA windows are the
    # largest in a quantized loop; spreading the same 12 tiles over
    # ~2x the launches should cut the exposed side MXU
    "bf16_b32_attn": (False, 32, True),
    "int4w8a8_b32_attn": (True, 32, True),
    # round-5 third wave: the B=64 offline-throughput point (the
    # prefill-absorption close-out's batch-scaling ladder). The serial
    # ViT doubles (~104ms bf16) while the decode windows grow only by
    # the extra cache stream — does absorption still pay?
    "bf16_b64": (False, 64, False),
    "int4w8a8_b64": (True, 64, False),
    # round-5 fourth wave: does the ladder really flatten past B=64?
    # The close-out predicted it from the serial Amdahl share (~48%
    # vision+prefill), but absorption hides the ViT half of that —
    # measure B=128 in both regimes before trusting the prediction.
    # Memory: KV cache 24L x 2 x 128 x 64 x 2048 bf16 ~= 1.6 GiB on
    # top of the ~2.8 GiB params — fits the 16 GiB chip.
    "bf16_b128": (False, 128, False),
    "int4w8a8_b128": (True, 128, False),
}
sel = [a for a in sys.argv[1:] if a in ARMS] or list(ARMS)

out = {}
for name in sel:
    from open_flamingo_tpu.models import absorb_vit

    quant, B, attn_c = ARMS[name]
    absorb_vit.ATTN_CARRIERS = attn_c
    vision_x = jnp.asarray(
        rng.normal(size=(B, 1, 1, 224, 224, 3)) * 0.3, jnp.bfloat16
    )
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    gen = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id
    )
    if quant:
        params = jax.jit(
            lambda v: quantize_prefill_params(v, bits=4)
        )(params_bf16)
    else:
        params = params_bf16

    lat_fn = jax.jit(
        lambda p, vx: model.apply(p, vx, method=Flamingo.embed_vision)
    )
    latents = lat_fn(params, vision_x)

    serial = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(model, p, vx, i, mk, gen)
    )
    absorb = jax.jit(
        lambda p, lt, vx, i, mk: flamingo_generate(
            model, p, None, i, mk, gen, media_latents=lt, next_pixels=vx
        )
    )
    plain_lat = jax.jit(
        lambda p, lt, i, mk: flamingo_generate(
            model, p, None, i, mk, gen, media_latents=lt
        )
    )

    # parity gates (run once per stack)
    if quant:
        w8a8.ENABLED = True
    tok_a, lat_next = absorb(params, latents, vision_x, ids, mask)
    tok_p = plain_lat(params, latents, ids, mask)
    w8a8.ENABLED = False
    exact = bool((np.asarray(tok_a) == np.asarray(tok_p)).all())
    lat_ref = np.asarray(latents, np.float32)
    lat_abs = np.asarray(lat_next, np.float32)
    scale = max(np.abs(lat_ref).max(), 1e-6)
    lat_rel = float(np.abs(lat_abs - lat_ref).max() / scale)

    t_serial = timed(serial, params, vision_x, ids, mask, w8=quant)
    t_absorb = timed(absorb, params, latents, vision_x, ids, mask, w8=quant)
    t_plain = timed(plain_lat, params, latents, ids, mask, w8=quant)

    out[name] = {
        "serial_ms": round(t_serial * 1e3, 1),
        "absorb_ms": round(t_absorb * 1e3, 1),
        "plain_latents_ms": round(t_plain * 1e3, 1),
        "tok_s_serial": round(B * NEW / t_serial, 1),
        "tok_s_absorb": round(B * NEW / t_absorb, 1),
        "absorb_overhead_ms": round((t_absorb - t_plain) * 1e3, 1),
        "vit_in_serial_ms": round((t_serial - t_plain) * 1e3, 1),
        "tokens_exact_vs_plain": exact,
        "latents_rel_vs_embed_vision": lat_rel,
    }
    print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    # per-arm cleanup: quantized param copies + latents + results
    # accumulate across arms and OOM the 16GB chip on arm 4
    del params, latents, tok_a, lat_next, tok_p
    del serial, absorb, plain_lat, lat_fn
    import gc

    gc.collect()

print(json.dumps(out))
