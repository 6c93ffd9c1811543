"""ArcFace training subsystem: loss math + sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.train.arcface_loss import (
    arcface_margin_logits,
    init_classifier,
    softmax_xent,
)
from facerecognizeonnx_tpu.train.trainer import init_train_state, make_train_step


def test_margin_reduces_target_logit(rng):
    feats = rng.normal(size=(4, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    w = np.asarray(init_classifier(jax.random.PRNGKey(0), 512, 10))
    labels = jnp.asarray([0, 3, 7, 9])
    with_margin = np.asarray(
        arcface_margin_logits(jnp.asarray(feats), jnp.asarray(w), labels)
    )
    no_margin = np.asarray(
        arcface_margin_logits(jnp.asarray(feats), jnp.asarray(w), labels, margin=0.0)
    )
    rows = np.arange(4)
    tgt = labels
    # margin must strictly reduce the target-class logit, leave others
    assert (with_margin[rows, tgt] < no_margin[rows, tgt]).all()
    mask = np.ones_like(with_margin, bool)
    mask[rows, tgt] = False
    np.testing.assert_allclose(with_margin[mask], no_margin[mask], atol=1e-5)


def test_softmax_xent_matches_manual(rng):
    logits = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3, 4])
    got = float(softmax_xent(logits, labels))
    p = jax.nn.log_softmax(logits)
    ref = -float(jnp.mean(p[jnp.arange(5), labels]))
    assert got == pytest.approx(ref, abs=1e-6)


def test_remat_step_matches_plain(rng):
    """jax.checkpoint must change memory, not math."""
    mesh = make_mesh(("data", "model"), (4, 2))
    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=32)
    images = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, 8), jnp.int32)
    losses = []
    for remat in (False, True):
        # fresh (deterministic) state per run — the step donates its input
        state = init_train_state(
            jax.random.PRNGKey(0), num_classes=16, cfg=cfg, arch="iresnet18",
            mesh=mesh, lr=0.1,
        )
        step = make_train_step(mesh, cfg, lr=0.1, remat=remat)
        with mesh:
            _, loss = step(state, images, labels)
        losses.append(float(loss))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


def test_train_step_decreases_loss_dp_mp(rng):
    """Full sharded train step on a (4 data × 2 model) virtual mesh:
    loss should drop when repeatedly fitting one tiny batch."""
    mesh = make_mesh(("data", "model"), (4, 2))
    cfg = PipelineConfig(compute_dtype="float32")
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=16, cfg=cfg, arch="iresnet18",
        mesh=mesh, lr=0.1,
    )
    step = make_train_step(mesh, cfg, lr=0.1)
    images = jnp.asarray(
        rng.uniform(-1, 1, (8, 112, 112, 3)).astype(np.float32)
    )
    labels = jnp.asarray(rng.integers(0, 16, 8), jnp.int32)

    with mesh:
        losses = []
        for _ in range(3):
            state, loss = step(state, images, labels)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 3
    # classifier sharding survives the update
    spec = state.classifier.sharding.spec
    assert tuple(spec) == (None, "model")
