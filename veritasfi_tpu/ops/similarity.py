"""Cosine similarity helpers used by rerank-time dedup.

The reference re-embeds every candidate chunk on GPU to build a pairwise
similarity matrix inside rank_chunk (reference: ensembleRetriever.py:265-281,
called at vllmManager.py:462) — pure waste, since retrieval already has the
chunk embeddings. Here the engine passes corpus rows straight in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def cosine_similarity_matrix(embeddings: jax.Array) -> jax.Array:
    """Pairwise cosine similarity of [C, D] rows (normalizes defensively)."""
    x = embeddings.astype(jnp.float32)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    return jnp.matmul(x, x.T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
