"""PerceiverResampler tests: shapes, per-media independence, and a
from-equations numpy cross-check of the attention core (K/V = concat of
media tokens and latents, helpers.py:53-54)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_flamingo_tpu.models.perceiver import PerceiverAttention, PerceiverResampler

B, T, F, V, D = 2, 3, 1, 5, 16


def test_resampler_shape(rng):
    x = jnp.asarray(rng.normal(size=(B, T, F, V, D)), jnp.float32)
    mod = PerceiverResampler(dim=D, depth=2, dim_head=8, heads=2, num_latents=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (B, T, 4, D)


def test_media_independence(rng):
    """Each media slot T is resampled independently: perturbing image t
    only changes latents for slot t."""
    x = jnp.asarray(rng.normal(size=(B, T, F, V, D)), jnp.float32)
    mod = PerceiverResampler(dim=D, depth=2, dim_head=8, heads=2, num_latents=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    base = np.asarray(mod.apply(params, x))
    x2 = x.at[:, 1].add(jnp.asarray(rng.normal(size=(B, F, V, D)), jnp.float32))
    out = np.asarray(mod.apply(params, x2))
    assert np.allclose(out[:, 0], base[:, 0], atol=1e-6)
    assert np.allclose(out[:, 2], base[:, 2], atol=1e-6)
    assert not np.allclose(out[:, 1], base[:, 1], atol=1e-3)


def _np_layernorm(x, g, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def test_perceiver_attention_equations(rng):
    """Cross-check PerceiverAttention against a direct numpy transcription
    of the math (independent of module wiring)."""
    heads, dim_head = 2, 8
    n1, n2 = 5, 4
    x = rng.normal(size=(1, 1, n1, D)).astype(np.float32)
    lat = rng.normal(size=(1, 1, n2, D)).astype(np.float32)
    mod = PerceiverAttention(dim=D, dim_head=dim_head, heads=heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lat))
    # randomize weights (init may be too symmetric)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.2), p.dtype), params
    )
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(lat)))

    p = jax.tree.map(np.asarray, params["params"])
    xn = _np_layernorm(x, p["norm_media"]["scale"], p["norm_media"]["bias"])
    ln = _np_layernorm(lat, p["norm_latents"]["scale"], p["norm_latents"]["bias"])
    q = ln @ p["to_q"]["kernel"]                      # (1,1,n2,inner)
    kv_in = np.concatenate([xn, ln], axis=-2)         # (1,1,n1+n2,D)
    kv = kv_in @ p["to_kv"]["kernel"]
    k, v = np.split(kv, 2, axis=-1)
    inner = heads * dim_head
    def sh(a):
        return a.reshape(1, 1, a.shape[-2], heads, dim_head).transpose(0, 1, 3, 2, 4)
    qh, kh, vh = sh(q) * dim_head**-0.5, sh(k), sh(v)
    sim = qh @ kh.transpose(0, 1, 2, 4, 3)
    sim = sim - sim.max(-1, keepdims=True)
    attn = np.exp(sim) / np.exp(sim).sum(-1, keepdims=True)
    out = (attn @ vh).transpose(0, 1, 3, 2, 4).reshape(1, 1, n2, inner)
    want = out @ p["to_out"]["kernel"]
    np.testing.assert_allclose(got, want, atol=1e-5)
