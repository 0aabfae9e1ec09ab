from .perceiver import PerceiverAttention, PerceiverResampler  # noqa: F401
from .xattn import (  # noqa: F401
    GatedCrossAttentionBlock,
    MaskedCrossAttention,
    cached_media_text_time,
    media_time_from_locations,
)
