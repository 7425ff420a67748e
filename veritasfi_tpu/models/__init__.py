from .encoder import ENCODER_PRESETS, EncoderArch, FlaxEncoder, TextEncoder
from .hash_embedder import HashEmbedder
from .m3_heads import M3_PRESETS, M3Arch, M3Embeddings, M3Encoder

__all__ = [
    "EncoderArch",
    "ENCODER_PRESETS",
    "FlaxEncoder",
    "TextEncoder",
    "HashEmbedder",
    "M3Arch",
    "M3_PRESETS",
    "M3Embeddings",
    "M3Encoder",
]
