"""OF-9B absorbed-ViT A/B (round 5, pad-slot schedule).

The ceil-macro plan (models/absorb_vit.py) unlocks the n=4 interleave:
5 MLP launches/group vs 12 slots/layer -> macro=3 with 3 pad launches
per macro body; 8 groups/token -> 2 leftover plain groups. OF-9B's
int8 MLP launches stream 64MB/fc (~70us DMA windows at line rate) —
much larger hiding budgets than OF-3B's — so the ViT side tiles that
were break-even on the int4 OF-3B stream may go positive here.

Arms (B=16, prompt 32, new 32, int8-resident stream + int8 KV + W8A8
prefill — bench.py's of9b config):
  serial:     generate(vision_x)                    — today's path
  plain_lat:  generate(media_latents only)          — decode w/o ViT
  absorb:     generate(media_latents, next_pixels)  — pipelined path
Parity gates: tokens(absorb) == tokens(plain_lat) exact; absorbed
latents vs embed_vision latents at bf16 rounding.
"""
import dataclasses
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

from open_flamingo_tpu.configs import flamingo_config
from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.absorb_vit import make_plan
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.ops import w8a8
from open_flamingo_tpu.quantize import (
    quantize_prefill_params,
    strip_resident_params,
)

B, T_TXT, NEW = 16, 32, 32

cfg = flamingo_config("OF-9B")
cfg = dataclasses.replace(cfg, scan_layers=True)
model = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
plan = make_plan(cfg, (B, 1, 1), NEW)
print(f"plan: {plan}", file=sys.stderr, flush=True)
assert plan is not None, "pad-slot plan must accept OF-9B geometry"

vx1 = jnp.zeros((1, 1, 1, 224, 224, 3), jnp.bfloat16)
i1 = jnp.zeros((1, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
m1 = jnp.ones((1, T_TXT), jnp.int32)
shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), vx1, i1, m1))
# built already-stripped so the ~18GB bf16 tree never exists on device
target = jax.eval_shape(
    lambda v: strip_resident_params(quantize_prefill_params(v)), shapes
)
params = jax.jit(
    lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), target)
)()
resident_gib = sum(
    int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(target)
) / 2**30
print(f"resident: {resident_gib:.2f} GiB", file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
vision_x = jnp.asarray(
    rng.normal(size=(B, 1, 1, 224, 224, 3)) * 0.3, jnp.bfloat16
)
ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
mask = jnp.ones((B, T_TXT), jnp.int32)
gen = GenerationConfig(
    max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
    int8_kv=True,
)

lat_fn = jax.jit(lambda p, vx: model.apply(p, vx, method=Flamingo.embed_vision))
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


def timed(fn, *args, reps=7):
    w8a8.ENABLED = True
    try:
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
    finally:
        w8a8.ENABLED = False
    return out, sorted(times)[len(times) // 2]


# parity first (absorb vs plain-latents decode must be token-exact)
w8a8.ENABLED = True
try:
    toks_abs, lat_abs = absorb(params, latents, vision_x, ids, mask)
    toks_pl = plain_lat(params, latents, ids, mask)
    toks_abs, toks_pl = np.asarray(toks_abs), np.asarray(toks_pl)
    lat_abs = np.asarray(lat_abs, np.float32)
    lat_ref = np.asarray(lat_fn(params, vision_x), np.float32)
finally:
    w8a8.ENABLED = False
tok_exact = bool((toks_abs == toks_pl).all())
lat_err = float(np.max(np.abs(lat_abs - lat_ref)))
print(f"tokens exact: {tok_exact}, latent max err: {lat_err:.2e}",
      file=sys.stderr, flush=True)

_, dt_serial = timed(serial, params, vision_x, ids, mask)
_, dt_absorb = timed(absorb, params, latents, vision_x, ids, mask)
_, dt_plain = timed(plain_lat, params, latents, ids, mask)

out = {
    "config": {
        "model": "OF-9B int8-resident + int8kv + W8A8",
        "b": B, "t_txt": T_TXT, "new": NEW,
        "resident_gib": round(resident_gib, 2),
        "plan": {
            "macro": plan.macro, "per_step": plan.per_step,
            "n_steps": plan.n_steps, "split": plan.split,
            "slots_per_layer": plan.slots_per_layer,
            "pad_slots_per_body": plan.macro * (cfg.cross_attn_every_n + 1)
            - plan.slots_per_layer,
        },
    },
    "parity": {"tokens_exact": tok_exact, "latent_max_err": lat_err},
    "serial_s": round(dt_serial, 4),
    "absorb_s": round(dt_absorb, 4),
    "plain_lat_s": round(dt_plain, 4),
    "vit_abs_overhead_ms": round((dt_absorb - dt_plain) * 1e3, 1),
    "serial_vit_ms": round((dt_serial - dt_plain) * 1e3, 1),
    "tok_s_serial": round(B * NEW / dt_serial, 1),
    "tok_s_absorb": round(B * NEW / dt_absorb, 1),
}
print(json.dumps(out), flush=True)
