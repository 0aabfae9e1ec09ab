"""Benchmark harness (driver contract): prints ONE JSON line.

Measures the flagship decode path from BASELINE.json configs[0]:
OF-3B (ViT-L/14 + MPT-1B arch, xattn every layer), single-image
prompts, KV-cached greedy generate. Metric: generated tokens/sec/chip
(vision encode + prefill + 32 decode steps all included in the timing).
Headline value = the best production config: B=64 scan int4 decode +
W8A8 prefill with the next batch's ViT absorbed into the decode loop
(round-5 batch-scaling + absorption studies); b32/b8 rows keep the
round-over-round comparison intact.

vs_baseline is null: the reference publishes no throughput numbers and
its CUDA stack cannot run here (BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _note(msg):
    """Progress to stderr — stdout stays the single-JSON-line contract."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# persistent compile cache: the driver re-runs this every round
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from open_flamingo_tpu.configs import flamingo_config
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo

    import numpy as np

    import dataclasses

    cfg = flamingo_config("OF-3B")
    model = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    # production decode config: lax.scan layer stack with the stacked-
    # weight decode engine (models/scan_decode.py) — same speed or
    # better than unrolled, O(1) compile in depth
    scan_model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    T_TXT, NEW = 32, 32

    def measure(B, int8=False, new=NEW, scan=False, w8a8_prefill=False,
                bits=8):
        from open_flamingo_tpu.ops import w8a8

        m = scan_model if scan else model
        vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
        ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
        mask = jnp.ones((B, T_TXT), jnp.int32)
        shapes = jax.eval_shape(
            lambda: m.init(jax.random.PRNGKey(0), vision_x, ids, mask)
        )
        # zeros created on device inside jit — no host->device weight
        # transfer, and params stay jit *arguments* (never constants).
        params = jax.jit(
            lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
        )()
        if w8a8_prefill:
            # W8A8 int8 prefill + vision on top of int8/int4 decode
            # (ops/w8a8.py, --int8_prefill [--int4_decode])
            from open_flamingo_tpu.quantize import quantize_prefill_params

            params = jax.jit(
                lambda v: quantize_prefill_params(v, bits=bits)
            )(params)
            w8a8.ENABLED = True
        elif int8:
            # int8 weight-streaming decode (quantize.py): halves the
            # per-token weight DMA. Zeros quantize to zeros/unit scales —
            # throughput is weight-value-independent.
            from open_flamingo_tpu.quantize import quantize_decode_params

            params = jax.jit(quantize_decode_params)(params)
        gen_cfg = GenerationConfig(
            max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id
        )
        jitted = jax.jit(
            lambda p, vx, i, mk: flamingo_generate(m, p, vx, i, mk, gen_cfg)
        )
        np.asarray(jitted(params, vision_x, ids, mask))  # compile + warmup
        w8a8.ENABLED = False
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            # full device->host sync; block_until_ready alone has been
            # observed to return early over the remote-device tunnel.
            np.asarray(jitted(params, vision_x, ids, mask))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        # steady-state (serving) throughput: keep batches in flight so
        # the device queue runs back-to-back and the per-batch host
        # dispatch (~30 ms over the remote tunnel) overlaps execution —
        # continuous batching, the serving operating mode. Execution is
        # in-order, so syncing the last result bounds all five.
        n_pipe = 5
        t0 = time.perf_counter()
        outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
        np.asarray(outs[-1])
        dt_pipe = (time.perf_counter() - t0) / n_pipe
        # compact keys (driver tail-captures ~2000 chars — BENCH_r04 was
        # truncated mid-JSON; keep the whole line well under that):
        # b=batch, tps=tokens/s/chip serial, tps_s=steady (5 in flight),
        # p50=per-image latency s
        return {
            "b": B,
            "tps": round(B * new / dt, 1),
            "tps_s": round(B * new / dt_pipe, 1),
            "p50": round(dt / B, 4),
        }

    def timed(name, **kw):
        t0 = time.perf_counter()
        r = measure(**kw)
        _note(f"{name}: {r['tps']} tok/s "
              f"({time.perf_counter()-t0:.0f}s incl. compile)")
        return r

    # round-5 row set (VERDICT r4 weak #2: superseded int8/unrolled rows
    # dropped so the whole JSON line fits the driver's 2000-char tail):
    # bf16 ceiling reference + the production config (scan engine + int4
    # weight streaming + W8A8 int8 prefill/vision).
    serve = timed("b32 bf16", B=32)   # latency-balanced serving batch
    serve_i4 = timed("b32 scan int4+w8a8", B=32, scan=True,
                     w8a8_prefill=True, bits=4)
    small_i4 = timed("b8 scan int4+w8a8", B=8, scan=True,
                     w8a8_prefill=True, bits=4)
    one_i4 = timed("b32 scan int4+w8a8 new=1", B=32, scan=True,
                   w8a8_prefill=True, bits=4, new=1)
    # offline-throughput point (round-5 batch-scaling ladder): B=64
    # serial, and the absorbed-ViT pipe on top (headline — see
    # bench_absorb_pipe docstring)
    big_i4 = timed("b64 scan int4+w8a8", B=64, scan=True,
                   w8a8_prefill=True, bits=4)
    tokens_per_sec = serve_i4["tps"]

    # amortized share of the per-batch vision encode + prefill in the
    # B=32 production generate (VERDICT r2 #3: report the share)
    dt32 = 32 * NEW / serve_i4["tps"]
    dt1 = 32 * 1 / one_i4["tps"]
    step = max((dt32 - dt1) / (NEW - 1), 1e-9)
    vision_prefill_s = max(dt1 - step, 0.0)

    detail = {
        "cfg": "pl32 new32; headline=B64 scan int4+W8A8 absorbed-ViT pipe",
        "b32_bf16": serve,
        "b32_i4": serve_i4,
        "b8_i4": small_i4,
        "b64_i4": big_i4,
        "vp_s": round(vision_prefill_s, 4),
        "vp_share": round(vision_prefill_s / dt32, 3),
    }
    try:
        detail["b32_bf16_pipe"] = bench_absorb_pipe(
            scan_model, cfg, T_TXT, NEW
        )
        _note(f"b32 bf16 pipe(absorb): {detail['b32_bf16_pipe']}")
    except Exception as e:
        detail["b32_bf16_pipe"] = {"err": repr(e)[:120]}
    try:
        detail["b64_i4_pipe"] = bench_absorb_pipe(
            scan_model, cfg, T_TXT, NEW, B=64, int4=True
        )
        _note(f"b64 int4 pipe(absorb): {detail['b64_i4_pipe']}")
        tokens_per_sec = detail["b64_i4_pipe"]["tps"]
    except Exception as e:  # headline falls back to the b32 serial row
        detail["b64_i4_pipe"] = {"err": repr(e)[:120]}

    for key, fn in (
        ("fewshot", bench_fewshot),
        ("of4b", bench_of4b),
        ("of9b", bench_of9b_resident),
        ("train", bench_train_step),
    ):
        try:
            detail[key] = fn()
            _note(f"{key}: {detail[key]}")
        except Exception as e:  # secondary config must not break the line
            detail[key] = {"err": repr(e)[:120]}

    print(
        json.dumps(
            {
                "metric": "of3b_generate_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": None,
                "detail": detail,
            }
        )
    )


def bench_absorb_pipe(scan_model, cfg, t_txt, new, B=32, int4=False):
    """Cross-batch pipelined serving: batch i's decode loop carries
    batch i+1's ViT as absorbed side tiles (generation.py next_pixels=,
    models/absorb_vit.py). The loop feeds each call's returned latents
    into the next call — the true steady-state operating mode. Measured
    (BASELINE round-5 studies): B=32 +4.7% bf16 / break-even int4;
    B=64 +6.1% bf16 / +7.0% int4 — the doubled KV-cache stream widens
    the per-launch DMA windows enough that even the int4 weight stream
    hides the ViT, so the B=64 int4 absorbed pipe is the production
    offline-throughput point (and the headline value)."""
    import numpy as np

    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.ops import w8a8

    m = scan_model
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, t_txt), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, t_txt), jnp.int32)
    shapes = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    if int4:
        from open_flamingo_tpu.quantize import quantize_prefill_params

        params = jax.jit(
            lambda v: quantize_prefill_params(v, bits=4)
        )(params)
    gen_cfg = GenerationConfig(
        max_new_tokens=new, pad_token_id=1, eos_token_id=cfg.eoc_token_id
    )
    w8a8.ENABLED = int4
    lat = jax.jit(
        lambda p, vx: m.apply(p, vx, method=Flamingo.embed_vision)
    )(params, vision_x)
    jitted = jax.jit(
        lambda p, lt, vx, i, mk: flamingo_generate(
            m, p, None, i, mk, gen_cfg, media_latents=lt, next_pixels=vx
        )
    )
    toks, lat = jitted(params, lat, vision_x, ids, mask)
    np.asarray(toks)
    w8a8.ENABLED = False
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        toks, lat = jitted(params, lat, vision_x, ids, mask)
        np.asarray(toks)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return {"b": B, "tps": round(B * new / dt, 1)}


def bench_fewshot():
    """The eval harness's true operating point (BASELINE configs[3]):
    B=8, 5 images (4 demos + query), prompt 128, beam 3, 20 new
    tokens — production stack (scan + int4 decode + W8A8 prefill +
    int8 KV + demo-latent cache all-hit). Round-1 measured 344 tok/s
    unrolled bf16; the beam path now prefills once per batch row and
    replicates the cache (generation.py _repeat_beams)."""
    import dataclasses

    import numpy as np

    from open_flamingo_tpu.configs import flamingo_config
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.ops import w8a8
    from open_flamingo_tpu.quantize import quantize_prefill_params

    cfg = flamingo_config("OF-3B")
    model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    B, T_IMG, T_TXT, NEW, BEAMS = 8, 5, 128, 20, 3
    vision_x = jnp.zeros((B, T_IMG, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32)
    for j in range(T_IMG):
        ids = ids.at[:, j * 8].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), shapes)
    )()
    params = jax.jit(lambda v: quantize_prefill_params(v, bits=4))(params)
    gen = GenerationConfig(
        max_new_tokens=NEW, num_beams=BEAMS, length_penalty=0.0,
        pad_token_id=1, eos_token_id=cfg.eoc_token_id, int8_kv=True,
    )
    w8a8.ENABLED = True
    lat_fn = jax.jit(
        lambda p, vx: model.apply(p, vx, method=Flamingo.embed_vision)
    )
    latents = lat_fn(params, vision_x)
    jitted = jax.jit(
        lambda p, lt, i, mk: flamingo_generate(
            model, p, None, i, mk, gen, media_latents=lt
        )
    )
    np.asarray(jitted(params, latents, ids, mask))
    w8a8.ENABLED = False
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jitted(params, latents, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return {
        "tps": round(B * NEW / dt, 1),
        "ips": round(B * T_IMG / dt, 1),
        "p50_img_ms": round(dt / (B * T_IMG) * 1e3, 1),
    }


def bench_of4b():
    """OF-4B (RedPajama-INCITE-3B gptneox, xattn every 2 —
    reference README.md:108): the xattn-every-2 interleave at 3B width
    is a distinct graph shape never benched before round 5 (VERDICT r4
    missing #3). Production stack: scan + int4 decode + W8A8 prefill +
    int8 KV, B=16 (3B bf16-resident fits the 16GB chip after int4
    streaming strip)."""
    import dataclasses

    import numpy as np

    from open_flamingo_tpu.configs import flamingo_config
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.ops import w8a8
    from open_flamingo_tpu.quantize import (
        quantize_prefill_params,
        strip_resident_params,
    )

    cfg = flamingo_config("OF-4B")
    model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    B, T_TXT, NEW = 16, 32, 32
    vx1 = jnp.zeros((1, 1, 1, 224, 224, 3), jnp.bfloat16)
    i1 = jnp.zeros((1, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    m1 = jnp.ones((1, T_TXT), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), vx1, i1, m1))
    target = jax.eval_shape(
        lambda v: strip_resident_params(quantize_prefill_params(v, bits=4)),
        shapes,
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), target)
    )()
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    gen = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
        int8_kv=True,
    )
    w8a8.ENABLED = True
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(model, p, vx, i, mk, gen)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    w8a8.ENABLED = False
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    n_pipe = 4
    t0 = time.perf_counter()
    outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
    np.asarray(outs[-1])
    dtp = (time.perf_counter() - t0) / n_pipe
    return {
        "b": B,
        "tps": round(B * NEW / dt, 1),
        "tps_s": round(B * NEW / dtp, 1),
        "p50": round(dt / B, 4),
    }


def bench_of9b_resident():
    """OF-9B (MPT-7B, the reference's flagship) int8-resident decode on
    ONE 16GB chip: bf16 OF-9B (~18GB) cannot even be placed here; the
    stripped tree keeps 8.03 GiB resident (scripts_dev/tpu_9b_resident).
    W8A8 prefill + int8 fused scan decode + int8 KV, B=16."""
    import dataclasses

    import numpy as np

    from open_flamingo_tpu.configs import flamingo_config
    from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
    from open_flamingo_tpu.models.flamingo import Flamingo
    from open_flamingo_tpu.ops import w8a8
    from open_flamingo_tpu.quantize import (
        quantize_prefill_params,
        strip_resident_params,
    )

    cfg = flamingo_config("OF-9B")
    model = Flamingo(
        cfg=dataclasses.replace(cfg, scan_layers=True),
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    B, T_TXT, NEW = 16, 32, 32
    vx1 = jnp.zeros((1, 1, 1, 224, 224, 3), jnp.bfloat16)
    i1 = jnp.zeros((1, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    m1 = jnp.ones((1, T_TXT), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), vx1, i1, m1))
    # the param tree is built ALREADY-STRIPPED (shape-level quantize+strip
    # under eval_shape) so the ~18GB bf16 tree never exists on device
    target = jax.eval_shape(
        lambda v: strip_resident_params(quantize_prefill_params(v)), shapes
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), target)
    )()
    resident_gib = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize for x in jax.tree.leaves(target)
    ) / 2**30
    vision_x = jnp.zeros((B, 1, 1, 224, 224, 3), jnp.bfloat16)
    ids = jnp.zeros((B, T_TXT), jnp.int32).at[:, 0].set(cfg.media_token_id)
    mask = jnp.ones((B, T_TXT), jnp.int32)
    gen = GenerationConfig(
        max_new_tokens=NEW, pad_token_id=1, eos_token_id=cfg.eoc_token_id,
        int8_kv=True,
    )
    w8a8.ENABLED = True
    jitted = jax.jit(
        lambda p, vx, i, mk: flamingo_generate(model, p, vx, i, mk, gen)
    )
    np.asarray(jitted(params, vision_x, ids, mask))
    w8a8.ENABLED = False
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jitted(params, vision_x, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    n_pipe = 4
    t0 = time.perf_counter()
    outs = [jitted(params, vision_x, ids, mask) for _ in range(n_pipe)]
    np.asarray(outs[-1])
    dtp = (time.perf_counter() - t0) / n_pipe
    return {
        "b": B,
        "tps": round(B * NEW / dt, 1),
        "tps_s": round(B * NEW / dtp, 1),
        "p50": round(dt / B, 4),
        "res_gib": round(resident_gib, 2),
    }


def bench_train_step():
    """MMC4-style interleaved train step (BASELINE configs[4]): OF-3B arch
    with xattn every 4, bf16, remat, single chip."""
    import dataclasses

    import numpy as np

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
        donate_argnums=(0,),
    )
    state = TrainState.create(train, tx)

    import numpy as _np

    state, m = step(state, frozen, bl, bm)
    _np.asarray(m["loss"])  # sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, m = step(state, frozen, bl, bm)
        _np.asarray(m["loss"])
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]
    tokens = B_L * T_L + B_M * T_M
    images = B_L + B_M * N_IMG
    return {
        "tps": round(tokens / dt, 1),
        "ips": round(images / dt, 1),
        "step_s": round(dt, 4),
    }


if __name__ == "__main__":
    main()
