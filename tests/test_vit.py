"""ViT face embedder (models/vit.py) tests.

Covers the transformer recognizer family next to IResNet/MobileFaceNet:
topology parity vs an independent torch executor, head-BN folding,
pipeline + train-contract integration, and w8a8 quant-hook
compatibility.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import recognizer_apply, recognizer_module
from facerecognizeonnx_tpu.models import vit


@pytest.fixture(scope="module")
def params():
    p = vit.init_params(jax.random.PRNGKey(9), arch="vit_t")
    # non-trivial head-BN stats so folding is actually exercised
    rng = np.random.default_rng(4)
    bn = {
        "scale": jnp.asarray(rng.uniform(0.5, 1.5, 512), jnp.float32),
        "bias": jnp.asarray(rng.normal(0, 0.2, 512), jnp.float32),
        "mean": jnp.asarray(rng.normal(0, 0.3, 512), jnp.float32),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 512), jnp.float32),
    }
    return {**p, "features_bn": bn}


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(0).uniform(-1, 1, (2, 112, 112, 3)).astype(
        np.float32
    )


def test_forward_shape_and_finite(params, x):
    feats = jax.jit(lambda p, v: vit.apply(p, v))(params, jnp.asarray(x))
    assert feats.shape == (2, 512)
    assert feats.dtype == jnp.float32
    assert np.isfinite(np.asarray(feats)).all()


def test_torch_oracle_parity(params, x):
    """Same pytree through an independent torch executor (different
    matmul backend + op order)."""
    from tests.oracles.torch_models import vit_forward

    ours = np.asarray(vit.apply(params, jnp.asarray(x)))
    oracle = vit_forward(params, x)
    scale = np.abs(oracle).max()
    assert np.abs(ours - oracle).max() < 1e-5 * scale


def test_fold_inference_params_exact(params, x):
    ref = np.asarray(vit.apply(params, jnp.asarray(x)))
    folded = vit.fold_inference_params(params)
    assert "features_bn" not in folded
    got = np.asarray(vit.apply(folded, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_dispatch_and_embed_pipeline(params):
    assert recognizer_module("vit_s").__name__.endswith(".vit")
    from facerecognizeonnx_tpu.embed.pipeline import embed_crops

    cfg = PipelineConfig(compute_dtype="float32", rec_arch="vit_t")
    crops = np.random.default_rng(1).integers(
        0, 256, (3, 112, 112, 3)
    ).astype(np.uint8)
    feats = np.asarray(
        jax.jit(lambda p, c: embed_crops(p, c, cfg))(params, crops)
    )
    assert feats.shape == (3, 512)
    np.testing.assert_allclose(
        np.linalg.norm(feats, axis=1), 1.0, rtol=1e-5
    )


def test_train_contract(params, x):
    feats, stats = recognizer_apply(
        params, jnp.asarray(x), compute_dtype=jnp.float32, train=True
    )
    assert feats.shape == (2, 512)
    assert "features_bn" in stats
    updated = vit.update_bn_stats(params, stats)
    assert not np.allclose(
        np.asarray(updated["features_bn"]["mean"]),
        np.asarray(params["features_bn"]["mean"]),
    )


def test_quant_hooks(params, x):
    """w8a8 PTQ applies through the linear_fn hook; quantized output
    stays within a loose cosine bound of fp32."""
    from facerecognizeonnx_tpu.models import quant

    calib = jnp.asarray(x)
    qstate = jax.jit(
        lambda p, c: quant.quantize_recognizer(vit.apply, p, c, min_channels=64)
    )(params, calib)
    qrec = quant.QuantizedRecognizer(vit.apply, params, qstate)
    ref = np.asarray(vit.apply(params, jnp.asarray(x)))
    got = np.asarray(qrec.apply(jnp.asarray(x), jnp.float32))
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert (cos > 0.98).all(), cos


def test_bf16_close_to_f32(params, x):
    f32 = np.asarray(vit.apply(params, jnp.asarray(x), compute_dtype=jnp.float32))
    bf16 = np.asarray(
        vit.apply(params, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    )
    cos = (f32 * bf16).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf16, axis=-1)
    )
    assert (cos > 0.995).all(), cos


def test_train_step_decreases_loss_on_mesh():
    """ViT backbone through the partial-FC trainer on a dp x mp mesh —
    the same harness test_train.py runs for IResNet."""
    from facerecognizeonnx_tpu.parallel.mesh import make_mesh
    from facerecognizeonnx_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )

    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=32,
                         rec_arch="vit_t")
    mesh = make_mesh(("data", "model"), (2, 2), devices=jax.devices()[:4])
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=16, cfg=cfg, arch="vit_t",
        mesh=mesh, lr=0.01,
    )
    step = make_train_step(mesh, cfg, lr=0.01)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, 8), np.int32)
    with mesh:
        losses = []
        for _ in range(4):
            state, loss = step(state, imgs, labels)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
