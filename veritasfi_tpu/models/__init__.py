from .encoder import ENCODER_PRESETS, EncoderArch, FlaxEncoder, TextEncoder
from .hash_embedder import HashEmbedder

__all__ = [
    "EncoderArch",
    "ENCODER_PRESETS",
    "FlaxEncoder",
    "TextEncoder",
    "HashEmbedder",
]
