"""MobileFaceNet (w600k_mbf family) tests.

Covers the buffalo_s/sc recognizer family member next to IResNet
(SURVEY.md §2 C21): topology parity vs an independent torch executor,
exact full-BN folding, pipeline integration, and trainability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import mobilefacenet as mbf
from facerecognizeonnx_tpu.models import recognizer_apply, recognizer_module


@pytest.fixture(scope="module")
def params():
    p = mbf.init_params(jax.random.PRNGKey(7))
    # non-trivial BN stats so folding is actually exercised
    return jax.tree_util.tree_map(
        lambda v: v, _randomize_bn(p, np.random.default_rng(3))
    )


def _randomize_bn(params, rng):
    def walk(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias", "mean", "var"}:
                c = node["mean"].shape[0]
                return {
                    "scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                    "bias": jnp.asarray(rng.normal(0, 0.2, c), jnp.float32),
                    "mean": jnp.asarray(rng.normal(0, 0.3, c), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2.0, c), jnp.float32),
                }
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def test_forward_shape_and_finite(params):
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 112, 112, 3)),
                    jnp.float32)
    feats = jax.jit(lambda p, v: mbf.apply(p, v))(params, x)
    assert feats.shape == (2, 512)
    assert feats.dtype == jnp.float32
    assert np.isfinite(np.asarray(feats)).all()


def test_torch_oracle_parity(params, rng):
    """Same pytree through an independent torch (NCHW/oneDNN) executor."""
    from tests.oracles.torch_models import mobilefacenet_forward

    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    ours = np.asarray(mbf.apply(params, jnp.asarray(x)))
    oracle = mobilefacenet_forward(params, x)
    # randomized BNs over 15 residual blocks blow activations up to ~2e4,
    # so fp parity is judged against the OUTPUT SCALE (different conv
    # backends accumulate in different orders), not elementwise rtol
    scale = np.abs(oracle).max()
    assert np.abs(ours - oracle).max() < 1e-5 * scale


def test_fold_inference_params_exact(params, rng):
    """mbf's BNs are ALL post-conv → the fold removes every BN and the
    outputs match to float rounding."""
    x = jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)), jnp.float32)
    ref = np.asarray(mbf.apply(params, x))
    folded = mbf.fold_inference_params(params)

    def count_bns(node):
        if isinstance(node, dict):
            if set(node) == {"scale", "bias", "mean", "var"}:
                return 1
            return sum(count_bns(v) for v in node.values())
        if isinstance(node, list):
            return sum(count_bns(v) for v in node)
        return 0

    assert count_bns(folded) == 0, "folded mbf must contain zero BN nodes"
    out = np.asarray(mbf.apply(folded, x))
    # scale-aware fp tolerance (see test_torch_oracle_parity)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 1e-5 * scale


def test_param_count_is_mbf_scale():
    """The mbf config is a compact model (~a few M params), far under
    IResNet-50's 43M — the family member exists to be the fast option."""
    p = mbf.init_params(jax.random.PRNGKey(0))
    n = mbf.num_params(p)
    assert 2e6 < n < 6e6, n


def test_recognizer_dispatch(params):
    assert recognizer_module("mbf") is mbf
    assert recognizer_module("mbf_large") is mbf
    x = jnp.zeros((1, 112, 112, 3), jnp.float32)
    feats = recognizer_apply(params, x, compute_dtype=jnp.float32)
    assert feats.shape == (1, 512)


def test_pipeline_embed_with_mbf(rng):
    """FaceRecognizer(rec_arch='mbf') drives the full align→embed→compare
    surface (reference semantics: src/face_recognizer.cpp:236-334)."""
    from facerecognizeonnx_tpu.pipeline.api import FaceRecognizer
    from facerecognizeonnx_tpu.types import FaceBox

    cfg = PipelineConfig(rec_arch="mbf", compute_dtype="float32")
    rec = FaceRecognizer(cfg)
    assert rec.load_model(None)
    img = rng.integers(0, 255, (160, 160, 3), np.uint8)
    face = FaceBox(
        box=(40, 40, 80, 80),
        score=0.9,
        landmarks=np.array([(60.0, 70.0), (100.0, 70.0), (80.0, 90.0),
                            (65.0, 110.0), (95.0, 110.0)], np.float32),
    )
    feat = rec.extract_feature(img, face)
    assert feat.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(feat), 1.0, atol=1e-4)
    # self-similarity 1.0 → mapped (1+1)/2
    assert abs(rec.compare_faces(feat, feat) - 1.0) < 1e-5
    simple = rec.extract_feature_simple(img)
    assert simple.shape == (512,)


def test_mbf_train_step_runs():
    """One sharded train step with the mbf backbone (partial-FC classifier)
    — the trainer dispatches the backbone on param structure."""
    from facerecognizeonnx_tpu.parallel.mesh import make_mesh
    from facerecognizeonnx_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    devices = jax.devices()[:2]
    mesh = make_mesh(("data", "model"), (1, 2), devices=devices)
    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=32)
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=8, cfg=cfg, arch="mbf",
        mesh=mesh, lr=0.1,
    )
    step = make_train_step(mesh, cfg, lr=0.1)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray([0, 3], jnp.int32)
    with mesh:
        state, loss = step(state, images, labels)
    assert np.isfinite(float(loss))
