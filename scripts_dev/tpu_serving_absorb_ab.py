"""On-TPU A/B: ServingEngine absorbed-ViT pre-encode (serving.py
absorb_vision=True) vs the serial vision+prefill admission path, on the
churn workload of tpu_serving_ab.py (64 requests, ragged prompts, one
image each, mixed max_new, saturated queue).

With absorption on, cycles of `b_pre` queue-head images ride the decode
chunks as fused-kernel side tiles (3 chunks per 24-layer ViT cycle at
chunk 8); admission waves whose rids are pooled skip embed_vision
entirely (the vision-skipping prefill graph). Tokens are asserted EQUAL
between arms (per submission order).

Arms:
  * b8_int8: the production serving config (8 rows, int8 decode) —
    the absorbed-ViT laws predict ~wash here (B=8 generate absorption
    measured negative; pre-encode decouples the cycle from max_new but
    the side weight streams still amortize over only 32 images).
  * b32_bf16: the +4.7% generate-absorption regime (32 rows, bf16).

Run on the real TPU:  python scripts_dev/tpu_serving_absorb_ab.py
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
from open_flamingo_tpu.generation import GenerationConfig
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.quantize import quantize_decode_params
from open_flamingo_tpu.serving import ServingEngine

cfg = flamingo_config("OF-3B")
P_MAX, CHUNK, S_MAX, N_REQ, B_PRE, DEPTH = 32, 8, 256, 64, 32, 4
rng = np.random.default_rng(0)

reqs = []
for i in range(N_REQ):
    p = int(rng.integers(8, P_MAX + 1))
    ids = rng.integers(10, 1000, size=(p,)).astype(np.int32)
    ids[0] = cfg.media_token_id
    vx = np.zeros((1, 1, 224, 224, 3), np.float32)
    max_new = int(rng.choice([8, 16, 32, 64]))
    reqs.append((vx, ids, max_new))
useful = sum(r[2] for r in reqs)
print(f"workload: {N_REQ} requests, {useful} useful tokens", flush=True)

gen = GenerationConfig(
    max_new_tokens=0, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
)


def zeros_params(model, quant):
    vx = jnp.zeros((1, 1, 1, 224, 224, 3), jnp.bfloat16)
    i2 = jnp.zeros((1, P_MAX), jnp.int32).at[:, 0].set(cfg.media_token_id)
    m2 = jnp.ones((1, P_MAX), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), vx, i2, m2)
    )
    z = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    return jax.jit(quantize_decode_params)(z) if quant else z


def run_pass(eng, absorb: bool):
    # toggling is A/B-only surgery: drop any straggler cycle/pool so an
    # off pass never carries the previous absorb pass's side work
    eng._absorb_on = absorb
    eng._abs_xw, eng._abs_done, eng._abs_rids = None, 0, []
    eng._lat_pool.clear()
    rids = [
        eng.submit(vx, ids, max_new_tokens=mn) for vx, ids, mn in reqs
    ]
    t0 = time.perf_counter()
    res = eng.run()
    dt = time.perf_counter() - t0
    assert len(res) == N_REQ
    return dt, [np.asarray(res[r]) for r in rids]


def arm(name: str, rows: int, quant: bool):
    model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    params = zeros_params(model, quant)
    eng = ServingEngine(
        model, params, batch_size=rows, max_seq_len=S_MAX,
        max_prompt_len=P_MAX, chunk_tokens=CHUNK, gen=gen,
        pipeline_depth=DEPTH, absorb_vision=True, absorb_batch=B_PRE,
    )
    assert eng._absorb_on, "absorb gate must be live on TPU scan engine"
    print(f"[{name}] warmup serial...", flush=True)
    run_pass(eng, absorb=False)
    dt_off, toks_off = run_pass(eng, absorb=False)
    print(f"[{name}] warmup absorb (compiles absorb graphs)...", flush=True)
    run_pass(eng, absorb=True)
    h0, m0 = eng.absorb_hits, eng.absorb_misses
    dt_on, toks_on = run_pass(eng, absorb=True)
    hits, misses = eng.absorb_hits - h0, eng.absorb_misses - m0
    for a, b in zip(toks_off, toks_on):
        np.testing.assert_array_equal(a, b)
    out = {
        "off_tok_s": round(useful / dt_off, 1),
        "on_tok_s": round(useful / dt_on, 1),
        "net_ms": round((dt_off - dt_on) * 1e3, 1),
        "pool_hits": hits, "pool_misses": misses,
        "plan_n_steps": eng._abs_plan.n_steps if eng._abs_plan else None,
    }
    print(f"[{name}] {out}", flush=True)
    return out


results = {
    "b8_int8": arm("b8_int8", rows=8, quant=True),
    "b32_bf16": arm("b32_bf16", rows=32, quant=False),
}
print(json.dumps(results))
