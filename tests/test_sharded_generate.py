"""Tensor-parallel (ICI-sharded) decode: generation under a
(replica=1, fsdp, model) mesh must produce the same tokens as
single-device generation — the BASELINE '9B sharded decode' config
exercised on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from open_flamingo_tpu.generation import GenerationConfig, flamingo_generate
from open_flamingo_tpu.parallel import MeshConfig, make_mesh, shard_params

from test_flamingo import EOC, MEDIA, PAD, VOCAB, make_batch, tiny_flamingo

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'


def test_sharded_generate_matches_single_device(rng):
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    cfg = GenerationConfig(
        max_new_tokens=6, pad_token_id=PAD, eos_token_id=EOC
    )

    ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )

    mesh = make_mesh(MeshConfig(replica=1, fsdp=4, model=2))
    params_s = shard_params(params, mesh)
    data = NamedSharding(mesh, P())  # replicate inputs (TP-style decode)
    with jax.set_mesh(mesh):
        got = np.asarray(
            flamingo_generate(
                model,
                params_s,
                jax.device_put(vision_x, data),
                jax.device_put(ids, data),
                jax.device_put(mask, data),
                cfg,
            )
        )
    np.testing.assert_array_equal(got, ref)


def test_sharded_beam_generate(rng):
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    cfg = GenerationConfig(
        max_new_tokens=5, num_beams=3, pad_token_id=PAD, eos_token_id=EOC
    )
    ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )
    mesh = make_mesh(MeshConfig(replica=1, fsdp=4, model=2))
    params_s = shard_params(params, mesh)
    data = NamedSharding(mesh, P())
    with jax.set_mesh(mesh):
        got = np.asarray(
            flamingo_generate(
                model, params_s,
                jax.device_put(vision_x, data),
                jax.device_put(ids, data),
                jax.device_put(mask, data),
                cfg,
            )
        )
    np.testing.assert_array_equal(got, ref)


def test_fused_decode_gate_on_sharded_params(rng):
    """VERDICT r2 #2: `use_fused_decode` must gate OFF (even under
    FORCE_FUSED) when params carry a model-axis sharding — the fused
    pallas_calls have no partitioning rules. Generate must still match
    single-device tokens via the einsum fallback."""
    from open_flamingo_tpu.ops import dense_stream

    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    cfg = GenerationConfig(
        max_new_tokens=4, pad_token_id=PAD, eos_token_id=EOC
    )
    ref = np.asarray(
        flamingo_generate(model, params, vision_x, ids, mask, cfg)
    )

    mesh = make_mesh(MeshConfig(replica=1, fsdp=4, model=2))
    params_s = shard_params(params, mesh)
    assert dense_stream.params_model_sharded(params_s)
    assert not dense_stream.params_model_sharded(params)

    data = NamedSharding(mesh, P())
    old = (dense_stream.FORCE_FUSED, dense_stream.INTERPRET)
    try:
        dense_stream.FORCE_FUSED = True
        dense_stream.INTERPRET = True
        with jax.set_mesh(mesh):
            got = np.asarray(
                flamingo_generate(
                    model, params_s,
                    jax.device_put(vision_x, data),
                    jax.device_put(ids, data),
                    jax.device_put(mask, data),
                    cfg,
                )
            )
        # generate auto-detected the sharding and disabled fusion
        assert dense_stream._MODEL_SHARDED
        assert not dense_stream.use_fused_decode(1, True)
    finally:
        dense_stream.FORCE_FUSED, dense_stream.INTERPRET = old
        dense_stream.note_params_sharding(params)  # reset the gate
    np.testing.assert_array_equal(got, ref)
    # unsharded params re-enable the gate
    assert not dense_stream._MODEL_SHARDED


@pytest.mark.parametrize(
    "family", ["mpt", "gptneox", "llama", "gptj", "opt"]
)
def test_tp_fused_scan_generate_matches_single_device(rng, family):
    """The shard_map'd TP fused decode engine (models/tp_decode.py):
    scan layout + model-axis-sharded params on the (fsdp=4, model=2)
    mesh, FORCE_FUSED+INTERPRET, must produce exactly the single-device
    tokens — and must actually ENGAGE (not fall back to einsum).
    Covers the fused-QKV split (mpt thirds, gptneox per-head
    interleave), llama GQA (kv_heads=2 over tp=2), and the row-parallel
    bias-post-psum epilogues (gptj/opt)."""
    import dataclasses

    from open_flamingo_tpu.models import tp_decode
    from open_flamingo_tpu.models.decoders.common import DecoderConfig
    from open_flamingo_tpu.models.flamingo import Flamingo, FlamingoConfig
    from open_flamingo_tpu.models.vit import VisionConfig
    from open_flamingo_tpu.ops import dense_stream

    from test_scan_layers import _scan_variables

    vis = VisionConfig(
        image_size=14, patch_size=7, hidden_size=24, num_layers=1,
        num_heads=2, intermediate_size=32,
    )
    lm = {
        "mpt": DecoderConfig(
            family="mpt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, alibi=True,
            attention_bias=False, ln_no_bias=True, clip_qkv=6.0,
        ),
        "gptneox": DecoderConfig(
            family="gptneox", vocab_size=VOCAB, hidden_size=32,
            num_layers=2, num_heads=4, intermediate_size=64,
            rotary_pct=0.25, tie_word_embeddings=False,
        ),
        "llama": DecoderConfig(
            family="llama", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, num_kv_heads=2, intermediate_size=64,
            attention_bias=False, tie_word_embeddings=False,
            hidden_act="silu", use_parallel_residual=False,
        ),
        "gptj": DecoderConfig(
            family="gptj", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64, rotary_dim=4,
            tie_word_embeddings=False, lm_head_bias=True,
        ),
        "opt": DecoderConfig(
            family="opt", vocab_size=VOCAB, hidden_size=32, num_layers=2,
            num_heads=4, intermediate_size=64,
        ),
    }[family]
    fcfg = FlamingoConfig(
        vision=vis, lm=lm, media_token_id=MEDIA, eoc_token_id=EOC,
        cross_attn_every_n=1, num_vis_latents=4, perceiver_depth=1,
        perceiver_heads=2, perceiver_dim_head=8,
    )
    unrolled = Flamingo(cfg=fcfg)
    scanned = Flamingo(cfg=dataclasses.replace(fcfg, scan_layers=True))
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = unrolled.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    s_vars = _scan_variables(params, unrolled)
    cfg = GenerationConfig(
        max_new_tokens=5, pad_token_id=PAD, eos_token_id=EOC
    )
    ref = np.asarray(
        flamingo_generate(scanned, s_vars, vision_x, ids, mask, cfg)
    )

    mesh = make_mesh(MeshConfig(replica=1, fsdp=4, model=2))
    params_s = shard_params(s_vars, mesh)
    data = NamedSharding(mesh, P())
    old = (dense_stream.FORCE_FUSED, dense_stream.INTERPRET)
    tp_decode._ENGAGED = False
    try:
        dense_stream.FORCE_FUSED = True
        dense_stream.INTERPRET = True
        with jax.set_mesh(mesh):
            got = np.asarray(
                flamingo_generate(
                    scanned, params_s,
                    jax.device_put(vision_x, data),
                    jax.device_put(ids, data),
                    jax.device_put(mask, data),
                    cfg,
                )
            )
        assert tp_decode._ENGAGED, "TP fused engine did not engage"
    finally:
        dense_stream.FORCE_FUSED, dense_stream.INTERPRET = old
        dense_stream.note_params_sharding(params)
    np.testing.assert_array_equal(got, ref)
