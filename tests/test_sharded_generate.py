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
