"""Released-model architecture registry (README.md:104-110 of the
reference): OF-3B (MPT-1B, xattn every 1), OF-4B (RedPajama-INCITE-3B,
every 2), OF-9B (MPT-7B, every 4); plus scaled-down test/dev configs."""

from __future__ import annotations

from .models.decoders.common import DecoderConfig
from .models.flamingo import FlamingoConfig
from .models.vit import VisionConfig

VIT_L_14 = VisionConfig(
    image_size=224, patch_size=14, hidden_size=1024, num_layers=24,
    num_heads=16, intermediate_size=4096, hidden_act="quick_gelu",
    projection_dim=768,
)

# Tiny smoke-run tower (not a real CLIP): same 224px input so the data
# pipeline is unchanged, but 2 layers / d=128 — train-CLI smoke runs
# skip the ~10min ViT-L compile (use --vision_encoder_path ViT-Tiny).
VIT_TINY = VisionConfig(
    image_size=224, patch_size=32, hidden_size=128, num_layers=2,
    num_heads=2, intermediate_size=256, hidden_act="quick_gelu",
    projection_dim=64,
)

# OpenAI CLIP ViT-B/32 — the default RICES retrieval encoder
# (open_flamingo/eval/rices.py:14); encode_image output width 512.
VIT_B_32 = VisionConfig(
    image_size=224, patch_size=32, hidden_size=768, num_layers=12,
    num_heads=12, intermediate_size=3072, hidden_act="quick_gelu",
    projection_dim=512,
)

# mosaicml/mpt-1b-redpajama-200b (d_model 2048, 24 layers, 16 heads)
MPT_1B = DecoderConfig(
    family="mpt", vocab_size=50432, hidden_size=2048, num_layers=24,
    num_heads=16, intermediate_size=8192, max_position_embeddings=2048,
    alibi=True, attention_bias=False, ln_no_bias=True, tie_word_embeddings=True,
)

# togethercomputer/RedPajama-INCITE-Base-3B-v1 (GPT-NeoX arch)
REDPAJAMA_3B = DecoderConfig(
    family="gptneox", vocab_size=50432, hidden_size=2560, num_layers=32,
    num_heads=32, intermediate_size=10240, max_position_embeddings=2048,
    rotary_pct=1.0, use_parallel_residual=False, attention_bias=True,
    tie_word_embeddings=False,
)

# mosaicml/mpt-7b (d_model 4096, 32 layers, 32 heads)
MPT_7B = DecoderConfig(
    family="mpt", vocab_size=50432, hidden_size=4096, num_layers=32,
    num_heads=32, intermediate_size=16384, max_position_embeddings=2048,
    alibi=True, attention_bias=False, ln_no_bias=True, tie_word_embeddings=True,
)


def flamingo_config(
    name: str, media_token_id: int = 50433, eoc_token_id: int = 50432
) -> FlamingoConfig:
    """name in {OF-3B, OF-4B, OF-9B} (vocab ids default to the 3 added
    special tokens appended after GPT-NeoX vocab; real ids come from the
    tokenizer via the factory)."""
    if name == "OF-3B":
        lm, n = MPT_1B, 1
    elif name == "OF-4B":
        lm, n = REDPAJAMA_3B, 2
    elif name == "OF-9B":
        lm, n = MPT_7B, 4
    else:
        raise ValueError(name)
    # account for added special tokens (<|endofchunk|>, <image>, maybe <PAD>)
    vocab = max(lm.vocab_size, max(media_token_id, eoc_token_id) + 1)
    import dataclasses

    lm = dataclasses.replace(lm, vocab_size=vocab)
    return FlamingoConfig(
        vision=VIT_L_14,
        lm=lm,
        media_token_id=media_token_id,
        eoc_token_id=eoc_token_id,
        cross_attn_every_n=n,
    )
