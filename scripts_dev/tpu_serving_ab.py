"""On-TPU A/B: continuous-batching serving engine vs static batching.

Workload: requests with mixed generation lengths (the serving reality —
EOS lands at different steps). Static batching retires each batch at
its slowest sequence; the engine back-fills retired rows from the
queue. Reported: requests/s and generated tokens/s for both modes.

Zeros weights (throughput is value-independent); generation length is
forced per request via max_new_tokens so the mix is controlled.
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
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.serving import ServingEngine

cfg = flamingo_config("OF-3B")
model = Flamingo(
    cfg=dataclasses.replace(cfg, scan_layers=True),
    dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
)

B, P_MAX, S_MAX, CHUNK = 8, 32, 256, 8
# mixed lengths: short/medium/long generations, mean 32
LENGTHS = [8, 16, 32, 64]
N_REQ = 48
rng = np.random.default_rng(0)
req_lens = [LENGTHS[i % len(LENGTHS)] for i in range(N_REQ)]

vision = np.zeros((1, 1, 224, 224, 3), np.float32)
ids = np.zeros((P_MAX,), np.int32)
ids[0] = cfg.media_token_id


def make_params():
    vx = jnp.asarray(vision[None], jnp.bfloat16)
    i2 = jnp.asarray(ids[None])
    m2 = jnp.ones((1, P_MAX), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), vx, i2, m2))
    return jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()


params = make_params()


def run_engine():
    eng = ServingEngine(
        model, params, batch_size=B, max_seq_len=S_MAX,
        max_prompt_len=P_MAX, chunk_tokens=CHUNK,
        gen=GenerationConfig(max_new_tokens=0, pad_token_id=1,
                             eos_token_id=-1),
    )
    for ln in req_lens:
        eng.submit(vision, ids, max_new_tokens=ln)
    t0 = time.perf_counter()
    res = eng.run()
    dt = time.perf_counter() - t0
    toks = sum(len(v) for v in res.values())
    return dt, toks


def run_static():
    """Static batches of B; each batch decodes to its LONGEST request."""
    total = 0
    gcfgs = {}
    t0 = time.perf_counter()
    for s in range(0, N_REQ, B):
        lens = req_lens[s : s + B]
        mx = max(lens)
        if mx not in gcfgs:
            gcfgs[mx] = GenerationConfig(
                max_new_tokens=mx, pad_token_id=1, eos_token_id=-1
            )
        vx = jnp.zeros((len(lens), 1, 1, 224, 224, 3), jnp.bfloat16)
        i2 = jnp.tile(jnp.asarray(ids[None]), (len(lens), 1))
        m2 = jnp.ones((len(lens), P_MAX), jnp.int32)
        out = flamingo_generate(model, params, vx, i2, m2, gcfgs[mx])
        np.asarray(out)
        total += sum(lens)        # only the requested tokens are useful
    return time.perf_counter() - t0, total


# warm both paths (compile), then measure
print("warming engine...", flush=True)
run_engine()
print("warming static...", flush=True)
run_static()

e_dt, e_toks = run_engine()
s_dt, s_toks = run_static()
out = {
    "engine_tok_s": round(e_toks / e_dt, 1),
    "engine_req_s": round(N_REQ / e_dt, 2),
    "static_tok_s": round(s_toks / s_dt, 1),
    "static_req_s": round(N_REQ / s_dt, 2),
    "speedup": round((N_REQ / e_dt) / (N_REQ / s_dt), 3),
}
print(json.dumps(out))
