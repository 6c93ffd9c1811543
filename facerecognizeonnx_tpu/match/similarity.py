"""Cosine-similarity face matching.

The reference's compareFaces (src/face_recognizer.cpp:320-334): dot
product of already-L2-normalized features remapped from [-1, 1] to
[0, 1] via (dot+1)/2, with 0.0 returned for empty/mismatched inputs;
verdicts threshold at 0.6 on the MAPPED scale (src/main.cpp:118).
"""

from __future__ import annotations

import jax.numpy as jnp


def compare_faces(f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """(…, D) × (…, D) → (…,) similarity on the [0, 1] scale."""
    dot = jnp.sum(f1 * f2, axis=-1)
    return (dot + 1.0) * 0.5


def similarity_matrix(queries: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """(Q, D) × (G, D) → (Q, G) mapped similarities — one MXU matmul."""
    dots = jnp.dot(
        queries, gallery.T, preferred_element_type=jnp.float32
    )
    return (dots + 1.0) * 0.5
