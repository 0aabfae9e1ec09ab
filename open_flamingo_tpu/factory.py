"""Public factory: create_model_and_transforms.

API parity with open_flamingo/src/factory.py:11-141, returning the
functional-JAX equivalents: (model, params, image_processor, tokenizer).
Instead of downloading torch backbones and monkey-patching them
(extend_instance / layer surgery), we resolve architecture configs and —
when local checkpoints are given — convert their weights into the param
pytree. The decoder-layer-attr inference table (factory.py:122-141)
becomes the family registry in models/lm.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from . import configs as _configs
from .image_processing import ImageProcessor
from .models.decoders.common import DecoderConfig
from .models.flamingo import Flamingo, FlamingoConfig
from .models.vit import VisionConfig
from .tokenization import SimpleTokenizer, prepare_hf_tokenizer

_VISION_REGISTRY = {
    "ViT-L-14": _configs.VIT_L_14,
    "ViT-B-32": _configs.VIT_B_32,
    # smoke-run tower: skips the ViT-L compile in train-CLI smoke tests
    "ViT-Tiny": _configs.VIT_TINY,
}

_LM_REGISTRY = {
    "mosaicml/mpt-1b-redpajama-200b": _configs.MPT_1B,
    "mosaicml/mpt-1b-redpajama-200b-dolly": _configs.MPT_1B,
    "togethercomputer/RedPajama-INCITE-Base-3B-v1": _configs.REDPAJAMA_3B,
    "togethercomputer/RedPajama-INCITE-Instruct-3B-v1": _configs.REDPAJAMA_3B,
    "mosaicml/mpt-7b": _configs.MPT_7B,
}


def _resolve_lm_config(lang_encoder_path: str) -> Tuple[DecoderConfig, Optional[str]]:
    """Registry name or local HF checkpoint dir -> (config, local_dir)."""
    if isinstance(lang_encoder_path, DecoderConfig):
        return lang_encoder_path, None
    if lang_encoder_path in _LM_REGISTRY:
        return _LM_REGISTRY[lang_encoder_path], None
    if os.path.isdir(lang_encoder_path):
        import transformers

        from .convert.hf_lm import config_from_hf

        hf_cfg = transformers.AutoConfig.from_pretrained(
            lang_encoder_path, trust_remote_code=True, local_files_only=True
        )
        return config_from_hf(hf_cfg), lang_encoder_path
    raise ValueError(
        f"unknown lang encoder {lang_encoder_path!r}; pass a registry name "
        f"({list(_LM_REGISTRY)}) or a local HF checkpoint directory"
    )


def create_model_and_transforms(
    clip_vision_encoder_path: str = "ViT-L-14",
    clip_vision_encoder_pretrained: str = "openai",
    lang_encoder_path: str = "mosaicml/mpt-1b-redpajama-200b",
    tokenizer_path: Optional[str] = None,
    cross_attn_every_n_layers: int = 1,
    use_local_files: bool = True,
    decoder_layers_attr_name: Optional[str] = None,  # accepted for API parity
    freeze_lm_embeddings: bool = False,
    cache_dir: Optional[str] = None,
    gradient_checkpointing: bool = False,
    *,
    scan_layers: bool = False,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    init_params: bool = False,
    init_seed: int = 0,
    vision_checkpoint: Optional[str] = None,
    lm_checkpoint: Optional[str] = None,
):
    """Build the TPU-native Flamingo.

    Returns (model, params, image_processor, tokenizer). `params` is None
    unless `init_params` (random init) or checkpoint paths are given
    (weights converted from local HF/open_clip checkpoints; network
    downloads are intentionally not performed).
    `freeze_lm_embeddings` is consumed by the training setup via
    train.optimizer.split_params.
    """
    if isinstance(clip_vision_encoder_path, VisionConfig):
        vision_cfg = clip_vision_encoder_path
    elif clip_vision_encoder_path in _VISION_REGISTRY:
        vision_cfg = _VISION_REGISTRY[clip_vision_encoder_path]
    else:
        raise ValueError(f"unknown vision encoder {clip_vision_encoder_path!r}")

    lm_cfg, lm_dir = _resolve_lm_config(lang_encoder_path)

    # tokenizer + special tokens (factory.py:50-63)
    if tokenizer_path and os.path.isdir(tokenizer_path):
        import transformers

        tok = transformers.AutoTokenizer.from_pretrained(
            tokenizer_path, trust_remote_code=True, local_files_only=True
        )
        tokenizer, media_id, eoc_id = prepare_hf_tokenizer(tok)
        vocab_size = max(lm_cfg.vocab_size, len(tokenizer))
    else:
        tokenizer = SimpleTokenizer(vocab_size=lm_cfg.vocab_size)
        # mirror the reference layout: ids appended at the end of the vocab;
        # the tokenizer must emit the SAME ids the model is configured with.
        from .tokenization import EOC_TOKEN, MEDIA_TOKEN

        eoc_id = tokenizer.pin(EOC_TOKEN, lm_cfg.vocab_size)
        media_id = tokenizer.pin(MEDIA_TOKEN, lm_cfg.vocab_size + 1)
        vocab_size = lm_cfg.vocab_size + 2

    lm_cfg = dataclasses.replace(lm_cfg, vocab_size=vocab_size)
    cfg = FlamingoConfig(
        vision=vision_cfg,
        lm=lm_cfg,
        media_token_id=media_id,
        eoc_token_id=eoc_id,
        cross_attn_every_n=cross_attn_every_n_layers,
        # the reference applies this post-wrap (train.py:368-381); here it
        # is jax.checkpoint on each decoder+xattn block (models/lm.py)
        gradient_checkpointing=gradient_checkpointing,
        scan_layers=scan_layers,
    )
    model = Flamingo(cfg=cfg, dtype=dtype, param_dtype=param_dtype)
    image_processor = ImageProcessor(image_size=vision_cfg.image_size)

    params = None
    if init_params or vision_checkpoint or lm_checkpoint or lm_dir:
        params = _init_params(model, cfg, init_seed)
        if lm_dir and lm_checkpoint is None:
            lm_checkpoint = lm_dir
        if lm_checkpoint:
            params = _load_lm(params, lm_checkpoint, lm_cfg)
        if vision_checkpoint:
            params = _load_vision(params, vision_checkpoint, vision_cfg)

    return model, params, image_processor, tokenizer


def _init_params(model: Flamingo, cfg: FlamingoConfig, seed: int):
    b, s = 1, 8
    vision_x = jnp.zeros((b, 1, 1, cfg.vision.image_size, cfg.vision.image_size, 3))
    ids = jnp.full((b, s), cfg.media_token_id, jnp.int32)
    return model.init(jax.random.PRNGKey(seed), vision_x, ids, jnp.ones_like(ids))


def _load_lm(params, path_or_sd, lm_cfg: DecoderConfig):
    from .convert.hf_lm import convert_lm_params

    sd = _load_state_dict(path_or_sd)
    converted = convert_lm_params(sd, lm_cfg)
    return _graft(params, ["params", "lm"], converted, resize_vocab=lm_cfg.vocab_size)


def _load_vision(params, path_or_sd, vision_cfg: VisionConfig):
    from .convert.hf_clip import convert_clip_vision_params

    sd = _load_state_dict(path_or_sd)
    converted = convert_clip_vision_params(sd, vision_cfg)
    return _graft(params, ["params", "vision_encoder"], converted)


def _load_state_dict(path_or_sd):
    if not isinstance(path_or_sd, (str, os.PathLike)):
        return path_or_sd
    path = str(path_or_sd)
    if os.path.isdir(path):
        import transformers

        m = transformers.AutoModelForCausalLM.from_pretrained(
            path, trust_remote_code=True, local_files_only=True
        )
        return m.state_dict()
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def _graft(params, subtree_path, converted, resize_vocab: Optional[int] = None):
    """Replace a subtree of the init params with converted weights, padding
    the embedding/lm_head vocab rows when the tokenizer added tokens
    (resize_token_embeddings, factory.py:90). New rows keep their random
    init values from `params`."""
    import numpy as np

    params = jax.tree.map(lambda x: x, params)  # shallow copy
    node = params
    for k in subtree_path[:-1]:
        node = node[k]
    old = node[subtree_path[-1]]

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = merge(dst.get(k, {}), v)
            else:
                tgt = dst.get(k)
                v = np.asarray(v)
                if (
                    resize_vocab is not None
                    and tgt is not None
                    and v.shape != tuple(tgt.shape)
                ):
                    # pad vocab dim with the random-init rows
                    pad = np.asarray(tgt, np.float32).copy()
                    sl = tuple(slice(0, d) for d in v.shape)
                    pad[sl] = v
                    v = pad
                dtype = tgt.dtype if tgt is not None else v.dtype
                out[k] = jnp.asarray(v, dtype)
        return out

    node[subtree_path[-1]] = merge(dict(old), converted)
    return params
