"""ArcFace additive-angular-margin loss with a shardable classifier.

The reference is inference-only (its w600k_r50 weights were trained with
exactly this loss on WebFace600k). The training subsystem completes the
framework: fine-tuning/retraining the embedder on TPU meshes, with the
classic partial-FC layout — the (D, C) classifier matrix is sharded
column-wise over the "model" axis (C can be millions of identities; the
per-chip matmul stays MXU-sized), while the batch shards over "data".
The cross-entropy below is written over global logits; GSPMD partitions
it and inserts the psum/all-reduce pattern automatically when the logits
carry a (data, model) sharding constraint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_classifier(key, feature_dim: int, num_classes: int) -> jnp.ndarray:
    """(D, C) class-center matrix, ~unit-norm columns."""
    w = jax.random.normal(key, (feature_dim, num_classes), jnp.float32)
    return w / jnp.linalg.norm(w, axis=0, keepdims=True)


def arcface_margin_logits(
    features: jnp.ndarray,
    classifier: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.5,
    scale: float = 64.0,
) -> jnp.ndarray:
    """(B, D) L2-normalized features → (B, C) margin-adjusted logits.

    cos(θ_y + m) on the target class, s·cos elsewhere — the ArcFace
    formulation. Numerically-safe θ via clipped arccos.
    """
    w = classifier / jnp.maximum(
        jnp.linalg.norm(classifier, axis=0, keepdims=True), 1e-12
    )
    cos = jnp.dot(features, w, preferred_element_type=jnp.float32)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    target = jnp.cos(theta + margin)
    return scale * (onehot * target + (1.0 - onehot) * cos)


def softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross entropy; stable log-softmax."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    target = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - target)
