"""Full-model save/load roundtrip, including restore onto a mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.parallel import MeshConfig, make_mesh
from open_flamingo_tpu.serialization import load_pretrained, save_pretrained

from test_flamingo import make_batch, tiny_flamingo

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'


def test_save_load_roundtrip(tmp_path, rng):
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    want, _, _ = model.apply(params, vision_x, ids, mask)

    save_pretrained(str(tmp_path / "m"), model, params)
    model2, params2 = load_pretrained(str(tmp_path / "m"))
    assert model2.cfg == model.cfg
    got, _, _ = model2.apply(params2, vision_x, ids, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_load_onto_mesh(tmp_path, rng):
    model = tiny_flamingo()
    vision_x, ids = make_batch(rng)
    mask = jnp.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), vision_x, ids, mask)
    want, _, _ = model.apply(params, vision_x, ids, mask)
    save_pretrained(str(tmp_path / "m"), model, params)

    mesh = make_mesh(MeshConfig(fsdp=4, model=2))
    model2, params2 = load_pretrained(str(tmp_path / "m"), mesh=mesh)
    with jax.set_mesh(mesh):
        got, _, _ = model2.apply(params2, vision_x, ids, mask)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )
