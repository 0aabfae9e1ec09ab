"""fp32 parity of the ViT vision tower vs HF CLIPVisionModel (tiny random
config), and ln_post/token semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_flamingo_tpu.convert.hf_clip import (
    convert_clip_vision_params,
    vision_config_from_hf,
)
from open_flamingo_tpu.models.vit import VisionTransformer

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'

torch = pytest.importorskip("torch")


def test_vit_matches_hf(rng):
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=28,
        patch_size=7,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    # HF last_hidden_state has no ln_post -> compare with post_ln_tokens=False
    cfg = dataclasses.replace(vision_config_from_hf(hf_cfg), post_ln_tokens=False)
    params = {"params": convert_clip_vision_params(hf.state_dict(), cfg)}
    params = jax.tree.map(jnp.asarray, params)

    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()[:, 1:]  # patch tokens

    model = VisionTransformer(cfg=cfg)
    got = np.asarray(model.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_vit_post_ln_semantics(rng):
    """post_ln_tokens=True applies ln_post to the patch tokens (open_clip
    output_tokens semantics used by the reference)."""
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=28, patch_size=7, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64, hidden_act="quick_gelu",
    )
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = vision_config_from_hf(hf_cfg)
    assert cfg.post_ln_tokens
    params = {"params": convert_clip_vision_params(hf.state_dict(), cfg)}
    params = jax.tree.map(jnp.asarray, params)

    imgs = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)))
        ln = hf.vision_model.post_layernorm
        want = ln(out.last_hidden_state).numpy()[:, 1:]

    got = np.asarray(VisionTransformer(cfg=cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)
