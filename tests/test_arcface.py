"""ArcFace IResNet parity vs the independent torch-CPU oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.models import arcface
from facerecognizeonnx_tpu.models.layers import l2_normalize
from tests.oracles.torch_models import iresnet_forward


def _floor_bn_var(params, floor=1e-2):
    """Clamp BN running variances away from 0.

    Calibration on a small batch can leave near-zero variances whose
    rsqrt amplifies backend-dependent f32 noise; trained nets don't have
    this pathology, so the floor keeps the parity oracle meaningful."""

    def walk(node):
        if isinstance(node, dict):
            if set(node) >= {"scale", "bias", "mean", "var"}:
                node = dict(node)
                node["var"] = jnp.maximum(node["var"], floor)
                return node
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def _calibrated(params, rng, batch=8):
    x_cal = jnp.asarray(rng.uniform(-1, 1, (batch, 112, 112, 3)).astype(np.float32))
    _, stats = arcface.apply(params, x_cal, train=True)
    return _floor_bn_var(arcface.update_bn_stats(params, stats))


@pytest.fixture(scope="module")
def r18_params():
    # iresnet18 keeps the parity test fast; the block/stage/head code paths
    # are identical to iresnet50 (same builder, different block counts).
    return arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")


def test_output_shape_and_dtype(r18_params):
    x = jnp.zeros((2, 112, 112, 3), jnp.float32)
    feats = arcface.apply(r18_params, x)
    assert feats.shape == (2, 512)
    assert feats.dtype == jnp.float32


def test_parity_vs_torch(r18_params, rng):
    # Freshly-initialized BN has identity running stats, so activations
    # amplify layer over layer (~340 at the output) and f32 rounding from
    # two different conv backends drifts to ~1% — calibrate BN running
    # stats (batch of 8, variance floored) so the net is well-conditioned
    # like a trained one, then demand tight agreement on fresh inputs.
    params = _calibrated(r18_params, rng)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    got = np.asarray(arcface.apply(params, jnp.asarray(x)))
    ref = iresnet_forward(params, x)
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 2e-4
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 1 - 1e-6


def test_parity_iresnet50_vs_torch(rng):
    params = arcface.init_params(jax.random.PRNGKey(1), arch="iresnet50")
    params = _calibrated(params, rng, batch=4)
    x = rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32)
    got = np.asarray(arcface.apply(params, jnp.asarray(x)))
    ref = iresnet_forward(params, x)
    cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 1 - 1e-6  # BASELINE.md: 1e-3 cosine budget; we're far inside


def test_deterministic_init():
    p1 = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    p2 = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_num_params_iresnet50():
    params = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet50")
    n = arcface.num_params(params)
    # w600k_r50.onnx is ~166 MB fp32 (reference models/README.md:46,51)
    # → ~43.6M params; builder must land in that ballpark.
    assert 40e6 < n < 48e6


def test_bf16_compute_close_to_f32(r18_params, rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32))
    f32 = np.asarray(arcface.apply(r18_params, x))
    bf16 = np.asarray(arcface.apply(r18_params, x, compute_dtype=jnp.bfloat16))
    f32n, bf16n = (v / np.linalg.norm(v) for v in (f32, bf16))
    cos = (f32n * bf16n).sum()
    assert cos > 1 - 1e-3  # embedding direction survives bf16 MXU compute


def test_l2_normalize_zero_guard():
    z = jnp.zeros((4,))
    out = np.asarray(l2_normalize(z))
    np.testing.assert_array_equal(out, np.zeros(4))  # reference :313 guard
    v = jnp.asarray([3.0, 4.0])
    np.testing.assert_allclose(np.asarray(l2_normalize(v)), [0.6, 0.8], atol=1e-7)


def test_train_mode_returns_batch_stats(r18_params, rng):
    x = jnp.asarray(rng.uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32))
    feats, stats = arcface.apply(r18_params, x, train=True)
    assert feats.shape == (4, 512)
    assert "bn1" in stats and "features_bn" in stats
    mean, var = stats["bn1"]
    assert mean.shape == (64,) and var.shape == (64,)


def test_bn_fold_parity(r18_params, rng):
    """fold_inference_params is EXACT: post-conv/post-FC BN folding must
    reproduce the unfolded forward bit-near (f32 matmul precision pinned:
    this CPU's default conv path is bf16-class AMX)."""
    params = _calibrated(r18_params, rng)
    folded = arcface.fold_inference_params(params)
    # folded pytree must have no bn2/bn3/down_bn/features_bn left
    flat = jax.tree_util.tree_flatten_with_path(folded)[0]
    paths = {"/".join(str(p) for p in path) for path, _ in flat}
    assert not any("bn2']" in p and "layer" in p for p in paths)
    assert not any("features_bn" in p for p in paths)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        y0 = np.asarray(arcface.apply(params, x))
        y1 = np.asarray(arcface.apply(folded, x))
    scale = np.abs(y0).max()
    assert np.abs(y0 - y1).max() < 1e-4 * max(scale, 1.0)


def test_bn_fold_bf16_embedding_direction(r18_params, rng):
    """Folded params under bf16 MXU compute keep the embedding direction
    (the quantity compareFaces consumes)."""
    params = _calibrated(r18_params, rng)
    folded = arcface.fold_inference_params(params)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32))
    a = np.asarray(arcface.apply(params, x, compute_dtype=jnp.bfloat16))
    b = np.asarray(arcface.apply(folded, x, compute_dtype=jnp.bfloat16))
    an, bn_ = (v / np.linalg.norm(v) for v in (a, b))
    assert (an * bn_).sum() > 1 - 1e-3
