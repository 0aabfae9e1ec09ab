"""On-TPU speculative decoding A/B (latency regime, B=1/B=4).

Zeros-weight draft and target both argmax to a constant token, so the
zeros run measures the FULL-ACCEPTANCE ceiling (real kernel + cache +
rollback mechanics, ideal draft); a random-init draft measures the
zero-acceptance floor. Real speedup with a trained draft lands between
them, weighted by the acceptance rate.

Draft: MPT-arch, 6 layers x d=768 (~1/12 the target's weight stream).
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
from open_flamingo_tpu.speculative import speculative_generate

cfg = flamingo_config("OF-3B")
target = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
draft_cfg = dataclasses.replace(
    cfg,
    lm=dataclasses.replace(
        cfg.lm, num_layers=6, hidden_size=768, num_heads=12,
        intermediate_size=3072,
    ),
)
draft = Flamingo(cfg=draft_cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

T_TXT, NEW, D = 32, 64, 4


def make_params(m, B, random=False):
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    if random:
        leaves, treedef = jax.tree.flatten(shapes)

        @jax.jit
        def mk():
            keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
            return treedef.unflatten([
                (jax.random.normal(k, l.shape, jnp.float32) * 0.02)
                .astype(l.dtype)
                for k, l in zip(keys, leaves)
            ])

        return mk(), (vision_x, ids, mask)
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    return params, (vision_x, ids, mask)


def bench(fn, args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


for B in (1, 4):
    gen = GenerationConfig(max_new_tokens=NEW, pad_token_id=1,
                           eos_token_id=cfg.eoc_token_id)
    tp, batch = make_params(target, B)
    dp_zero, _ = make_params(draft, B)
    dp_rand, _ = make_params(draft, B, random=True)

    base = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(target, p, vx, i, mk, gen)
    )
    spec = jax.jit(
        lambda p, dpp, vx, i, mk: speculative_generate(
            target, p, draft, dpp, vx, i, mk, gen, num_draft_tokens=D
        )
    )
    t_base = bench(lambda vx, i, mk: base(tp, vx, i, mk), batch)
    t_ceil = bench(lambda vx, i, mk: spec(tp, dp_zero, vx, i, mk), batch)
    t_floor = bench(lambda vx, i, mk: spec(tp, dp_rand, vx, i, mk), batch)
    print(json.dumps({
        "B": B, "new": NEW, "D": D,
        "greedy_tok_s": round(B * NEW / t_base, 1),
        "spec_full_accept_tok_s": round(B * NEW / t_ceil, 1),
        "spec_zero_accept_tok_s": round(B * NEW / t_floor, 1),
        "ceiling_speedup": round(t_base / t_ceil, 2),
    }))
