"""Train-step roofline: trace-and-FLOP accounting for the bench.py
train config (OF-3B arch, xattn/4, remat, B=8 LAION@32 + 4 MMC4@256,
32 images/step).

Reports:
  * XLA's own FLOP count for the compiled step (cost_analysis) and the
    implied MFU vs the measured ~103 TFLOPs bf16 matmul floor
    (BASELINE.md, 4096^3 chained matmuls);
  * a component breakdown from separately-jitted pieces: frozen ViT
    forward, full fwd (loss only), full fwd+bwd+optimizer step;
  * an xplane trace (pass --trace DIR) for parse_xplane*.py.

The decode path got four kernel studies; this is the equivalent
evidence for the reference's core runtime
(open_flamingo/train/train_utils.py:85-216).
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
from open_flamingo_tpu.models.flamingo import Flamingo
from open_flamingo_tpu.train.optimizer import (
    OptimizerConfig,
    make_optimizer,
    split_params,
)
from open_flamingo_tpu.train.train_loop import (
    TrainLoopConfig,
    TrainState,
    make_train_step,
)

BF16_FLOOR_TFLOPS = 103.0

cfg = flamingo_config("OF-3B")
cfg = dataclasses.replace(
    cfg, cross_attn_every_n=4, gradient_checkpointing=True
)
model = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)

B_L, B_M, T_L, T_M, N_IMG = 8, 4, 32, 256, 6
rng = np.random.default_rng(0)


def mk_batch(b, t_img, t_txt):
    ids = rng.integers(10, 50000, size=(b, t_txt)).astype(np.int32)
    ids[:, 0] = cfg.media_token_id
    ids[:, t_txt // 2] = cfg.eoc_token_id
    if t_img > 1:
        ids[:, t_txt // 2 + 1] = cfg.media_token_id
    return {
        "vision_x": jnp.zeros((b, t_img, 1, 224, 224, 3), jnp.bfloat16),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, t_txt), jnp.int32),
    }


bl, bm = mk_batch(B_L, 1, T_L), mk_batch(B_M, N_IMG, T_M)
shapes = jax.eval_shape(
    lambda: model.init(
        jax.random.PRNGKey(0), bl["vision_x"], bl["input_ids"],
        bl["attention_mask"],
    )
)
params = jax.jit(
    lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
)()
train, frozen = split_params(params)
tx = make_optimizer(
    OptimizerConfig(warmup_steps=0),
    media_token_id=cfg.media_token_id, eoc_token_id=cfg.eoc_token_id,
)
step = jax.jit(
    make_train_step(model, tx, TrainLoopConfig(pad_token_id=1)),
)
state = TrainState.create(train, tx)


def med_time(run, n=5):
    run()
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


# --- full step: time + XLA flop count ---------------------------------------
lowered = step.lower(state, frozen, bl, bm)
compiled = lowered.compile()
ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
flops = float(ca.get("flops", float("nan")))
print(f"cost_analysis flops/step: {flops/1e12:.2f} TFLOP", flush=True)

out_state = {}


def run_step():
    s2, m = step(state, frozen, bl, bm)
    np.asarray(m["loss"])


dt_step = med_time(run_step)
tokens = B_L * T_L + B_M * T_M
mfu = flops / 1e12 / dt_step / BF16_FLOOR_TFLOPS
print(f"step {dt_step*1e3:.1f} ms, {tokens/dt_step:.0f} tok/s, "
      f"MFU vs bf16 floor: {mfu:.2%}", flush=True)

# --- components ---------------------------------------------------------------
# frozen ViT forward at the step's image load (8 + 24 images); reduce
# to a scalar in-graph (large D2H copies are ~4MB/s over the tunnel)
all_imgs = jnp.zeros((B_L + B_M * N_IMG, 1, 1, 224, 224, 3), jnp.bfloat16)
vit_fn = jax.jit(
    lambda p, vx: model.apply(
        p, vx, method=Flamingo.embed_vision
    ).astype(jnp.float32).sum()
)
dt_vit = med_time(lambda: np.asarray(vit_fn(params, all_imgs)))

# forward-only (both source losses, no grad)
from open_flamingo_tpu.train.train_loop import batch_losses

fwd_fn = jax.jit(
    lambda p, _bl, _bm: sum(batch_losses(
        model, p, _bl, _bm, TrainLoopConfig(pad_token_id=1)
    ))
)
dt_fwd = med_time(lambda: np.asarray(fwd_fn(params, bl, bm)))

res = {
    "step_ms": round(dt_step * 1e3, 1),
    "tok_s": round(tokens / dt_step, 1),
    "flops_per_step_tflop": round(flops / 1e12, 2),
    "mfu_vs_103tflops": round(mfu, 4),
    "vit_fwd_ms_32imgs": round(dt_vit * 1e3, 1),
    "vit_share": round(dt_vit / dt_step, 3),
    "fwd_only_ms": round(dt_fwd * 1e3, 1),
    "bwd_opt_ms": round((dt_step - dt_fwd) * 1e3, 1),
}
print(json.dumps(res))

# --- optional trace -----------------------------------------------------------
if "--trace" in sys.argv:
    d = sys.argv[sys.argv.index("--trace") + 1]
    with jax.profiler.trace(d):
        for _ in range(2):
            run_step()
    print("trace written to", d, flush=True)
