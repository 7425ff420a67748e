"""Vision encoder for figure/table-image chunks (ViT-class, Flax).

The reference's multi-modal story stops at text: its preprocessor renders
tables/figures into text chunks tied together by bundle_id (SURVEY.md §1
note; reference load_data.py:58-78 carries no image fields). BASELINE
config #4 extends this to a true mixed-modality index: figure chunks
embedded by an image encoder into the SAME unified corpus matrix as text
chunks, so mixed-modality retrieval is one top-k.

This is a standard ViT (patch embed -> pre-norm transformer -> CLS) with a
projection head onto the text embedding dimension and L2 normalization
(CLIP-style joint space). Random init here; weights convert from any local
CLIP-vision/ViT checkpoint via the same param-mapping approach as the text
encoders.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class ViTArch:
    image_size: int = 224
    patch_size: int = 16
    hidden: int = 384
    layers: int = 6
    heads: int = 6
    intermediate: int = 1536
    projection_dim: int = 384     # == text embedding dim (joint space)
    layer_norm_eps: float = 1e-5


VIT_PRESETS: Dict[str, ViTArch] = {
    "tiny-test": ViTArch(image_size=32, patch_size=8, hidden=64, layers=2,
                         heads=2, intermediate=128, projection_dim=64),
    # clip-vit-base-patch16-class
    "vit-base": ViTArch(hidden=768, layers=12, heads=12, intermediate=3072,
                        projection_dim=512),
}


class _Block(nn.Module):
    arch: ViTArch
    dtype: Any

    @nn.compact
    def __call__(self, x):
        a = self.arch
        h = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                         name="ln1")(x).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=a.heads, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                         name="ln2")(x).astype(self.dtype)
        h = nn.Dense(a.intermediate, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(a.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class FlaxViT(nn.Module):
    arch: ViTArch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pixels):  # [B, H, W, 3] in [0, 1]
        a = self.arch
        patches = nn.Conv(a.hidden, (a.patch_size, a.patch_size),
                          strides=(a.patch_size, a.patch_size),
                          dtype=self.dtype, name="patch_embed")(pixels)
        b, gh, gw, c = patches.shape
        x = patches.reshape(b, gh * gw, c)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, a.hidden))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, a.hidden)).astype(self.dtype), x],
            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, a.hidden))
        x = x + pos.astype(self.dtype)
        for i in range(a.layers):
            x = _Block(a, self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                         name="final_ln")(x)
        pooled = x[:, 0].astype(jnp.float32)
        proj = nn.Dense(a.projection_dim, use_bias=False, dtype=jnp.float32,
                        name="projection")(pooled)
        return proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)


class ImageEncoder:
    """Host-facing wrapper: image arrays/paths -> joint-space embeddings."""

    def __init__(self, preset: str = "tiny-test",
                 arch: Optional[ViTArch] = None,
                 params: Optional[Any] = None,
                 dtype: Any = jnp.float32, seed: int = 0) -> None:
        self.arch = arch or VIT_PRESETS[preset]
        self.module = FlaxViT(self.arch, dtype=dtype)
        if params is None:
            dummy = jnp.zeros(
                (1, self.arch.image_size, self.arch.image_size, 3),
                jnp.float32)
            params = self.module.init(jax.random.PRNGKey(seed), dummy)
        self.params = params
        self._forward = jax.jit(self.module.apply)

    @property
    def dim(self) -> int:
        return self.arch.projection_dim

    def preprocess(self, image) -> np.ndarray:
        """Path / PIL image / array -> [H, W, 3] float32 in [0, 1]."""
        if isinstance(image, str):
            from PIL import Image

            image = Image.open(image).convert("RGB")
        if hasattr(image, "resize") and not isinstance(image, np.ndarray):
            image = image.resize((self.arch.image_size, self.arch.image_size))
            image = np.asarray(image, np.float32) / 255.0
        raw = np.asarray(image)
        image = np.asarray(raw, np.float32)
        if raw.dtype == np.uint8:
            image = image / 255.0          # honor the [0, 1] contract for
        if image.ndim != 3 or image.shape[2] != 3:   # uint8 array inputs
            raise ValueError(f"expected [H, W, 3] image, got {raw.shape} "
                             f"({raw.dtype})")
        if image.shape[:2] != (self.arch.image_size, self.arch.image_size):
            raise ValueError(f"expected {self.arch.image_size}px square "
                             f"image, got {image.shape}")
        return image

    def encode(self, images: List) -> np.ndarray:
        if not images:
            return np.zeros((0, self.dim), np.float32)
        batch = np.stack([self.preprocess(im) for im in images])
        return np.asarray(self._forward(self.params, jnp.asarray(batch)),
                          np.float32)
