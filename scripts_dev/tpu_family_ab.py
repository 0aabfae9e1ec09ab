"""On-TPU fused-decode A/B for every LM family (VERDICT r2 #5).

For each family: tiny Flamingo, greedy generate with the fused decode
path (default on TPU) vs DISABLE_FUSED (plain XLA einsum path), token
equality + max logit drift. Exercises the real Mosaic lowering that
interpret-mode tests cannot (CLAUDE.md), including llama GQA (n_rep=2)
and a ragged intermediate size (3072 with block_k2=2048) on opt.

Also runs the int8 path (round-tripped weights -> token equality) and
the stacked-weight scan engine on-TPU for mpt.

Run: python scripts_dev/tpu_family_ab.py   (~5-10 min warm cache)
"""

import dataclasses
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.models.decoders.common import DecoderConfig
from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
from open_flamingo_tpu.models.lm import to_scanned_layout
from open_flamingo_tpu.models.vit import VisionConfig
from open_flamingo_tpu.ops import dense_stream
from open_flamingo_tpu.quantize import (
    dequantize_roundtrip,
    quantize_decode_params,
)

VOCAB, MEDIA, EOC = 512, 3, 4

VIS = VisionConfig(
    image_size=28, patch_size=7, hidden_size=128, num_layers=2,
    num_heads=4, intermediate_size=256,
)

LMS = {
    "mpt": DecoderConfig(
        family="mpt", vocab_size=VOCAB, hidden_size=256, num_layers=2,
        num_heads=8, intermediate_size=1024, alibi=True,
        attention_bias=False, ln_no_bias=True, clip_qkv=6.0,
    ),
    "gptneox": DecoderConfig(
        family="gptneox", vocab_size=VOCAB, hidden_size=256, num_layers=2,
        num_heads=8, intermediate_size=1024, rotary_pct=0.25,
        tie_word_embeddings=False,
    ),
    # GQA n_rep=2 exercises the grouped-cache head index maps
    "llama": DecoderConfig(
        family="llama", vocab_size=VOCAB, hidden_size=256, num_layers=2,
        num_heads=8, num_kv_heads=4, intermediate_size=1024,
        attention_bias=False, tie_word_embeddings=False,
        hidden_act="silu", use_parallel_residual=False,
    ),
    "gptj": DecoderConfig(
        family="gptj", vocab_size=VOCAB, hidden_size=256, num_layers=2,
        num_heads=8, intermediate_size=1024, rotary_dim=16,
        tie_word_embeddings=False, lm_head_bias=True,
    ),
    # intermediate 3072 > block_k2 2048 and NOT divisible: exercises the
    # ragged-K2 lane/row masking on real Mosaic (ADVICE r2 high)
    "opt": DecoderConfig(
        family="opt", vocab_size=VOCAB, hidden_size=256, num_layers=2,
        num_heads=8, intermediate_size=3072,
    ),
}


def run_family(family, rng):
    lm = LMS[family]
    cfg = FlamingoConfig(
        vision=VIS, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=2, num_vis_latents=8, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=16,
    )
    model = Flamingo(cfg=cfg, dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    B, T = 4, 8
    vision_x = jnp.asarray(
        rng.normal(size=(B, 1, 1, 28, 28, 3)), jnp.bfloat16
    )
    ids = rng.integers(7, VOCAB, size=(B, T))
    ids[:, 0] = MEDIA
    ids = jnp.asarray(ids, jnp.int32)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    params = dequantize_roundtrip(params)  # int8-grid weights
    gen_cfg = GenerationConfig(
        max_new_tokens=8, pad_token_id=1, eos_token_id=-1
    )

    def gen(p, m=model):
        return np.asarray(
            jax.jit(
                lambda p, vx, i, mk: flamingo_generate(m, p, vx, i, mk,
                                                       gen_cfg)
            )(p, vision_x, ids, mask)
        )

    dense_stream.DISABLE_FUSED = True
    try:
        ref = gen(params)
    finally:
        dense_stream.DISABLE_FUSED = False
    fused = gen(params)
    q = gen(quantize_decode_params(params))
    ok_f = (ref == fused).mean()
    ok_q = (ref == q).mean()
    line = (f"{family:8s} fused-vs-plain match {ok_f:.2f}  "
            f"int8-vs-plain match {ok_q:.2f}")

    if family in ("mpt", "llama"):
        # stacked-weight scan engine on real Mosaic
        scanned = Flamingo(
            cfg=dataclasses.replace(cfg, scan_layers=True),
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        lm_sc = to_scanned_layout(
            jax.tree.map(np.asarray, params["params"]["lm"]),
            lm.num_layers, cfg.cross_attn_every_n,
        )
        s_vars = {"params": {**params["params"],
                             "lm": jax.tree.map(jnp.asarray, lm_sc)}}
        scan_out = gen(s_vars, m=scanned)
        scan_q = gen(quantize_decode_params(s_vars), m=scanned)
        line += (f"  scan match {(ref == scan_out).mean():.2f}"
                 f"  scan-int8 match {(ref == scan_q).mean():.2f}")
    print(line, flush=True)
    return ok_f == 1.0 and ok_q == 1.0


def main():
    rng = np.random.default_rng(0)
    ok = True
    fams = sys.argv[1:] or list(LMS)
    for family in fams:
        ok &= run_family(family, rng)
    print("ALL OK" if ok else "MISMATCHES (see above)")


if __name__ == "__main__":
    main()
