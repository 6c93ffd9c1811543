"""w8a8 PTQ (models/quant.py): numeric contracts on CPU.

The quant path has NO reference counterpart (the reference is fp32
ONNX-on-CPU); its contract is a cosine bound vs the repo's own bf16
path, not ORT parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.models import arcface, quant
from facerecognizeonnx_tpu.models import layers as L


@pytest.fixture(scope="module")
def folded_params():
    p = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18", input_size=112)
    return arcface.fold_inference_params(p)


def _crops(n, key=1):
    rng = np.random.default_rng(key)
    x = rng.integers(0, 256, (n, 112, 112, 3)).astype(np.float32)
    return jnp.asarray((x - 127.5) / 128.0)


def test_conv2d_q_matches_simulated_quant():
    """conv2d_q == float conv over the dequantized int8 operands."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    conv = {"w": jnp.asarray(rng.standard_normal((3, 3, 16, 24)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal(24), jnp.float32)}
    w_q, w_scale = quant._quantize_weight(conv["w"], channel_axis=3)
    in_scale = jnp.max(jnp.abs(x)) / 127.0
    qp = {"w_q": w_q, "w_scale": w_scale, "in_scale": in_scale, "b": conv["b"]}

    got = quant.conv2d_q(qp, x, 1, 1, compute_dtype=jnp.float32)

    x_deq = quant._quantize_act(x, in_scale).astype(jnp.float32) * in_scale
    w_deq = w_q.astype(jnp.float32) * w_scale
    want = L.conv2d({"w": w_deq, "b": conv["b"]}, x_deq, 1, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-3)


def test_quantized_iresnet_cosine(folded_params):
    """Full quantized iresnet18 stays within PTQ-grade cosine of bf16."""
    calib = _crops(8, key=2)
    qstate = quant.quantize_recognizer(arcface.apply, folded_params, calib)
    assert all(q is not None for q in qstate["convs"])  # iresnet: all dense
    assert len(qstate["linears"]) == 1

    x = _crops(4, key=3)
    ref = arcface.apply(folded_params, x, compute_dtype=jnp.bfloat16)
    got = jax.jit(
        lambda p, q, v: quant.apply_quantized(arcface.apply, p, q, v)
    )(folded_params, qstate, x)

    ref_n = np.asarray(L.l2_normalize(ref))
    got_n = np.asarray(L.l2_normalize(got))
    cos = (ref_n * got_n).sum(axis=1)
    assert cos.min() > 0.97, cos  # random weights = worst-case conditioning


def test_quantized_mbf_cosine():
    """MobileFaceNet: dense 1x1/3x3 convs quantize, depthwise stays bf16."""
    from facerecognizeonnx_tpu.models import mobilefacenet as mbf

    params = mbf.fold_inference_params(
        mbf.init_params(jax.random.PRNGKey(7), arch="mbf")
    )
    calib = _crops(8, key=8)
    qstate = quant.quantize_recognizer(mbf.apply, params, calib)
    n_dense = sum(q is not None for q in qstate["convs"])
    n_grouped = sum(q is None for q in qstate["convs"])
    assert n_grouped == 17  # stem_dw + 15 body dw + gdc_dw
    assert n_dense == 32  # stem + 15x(pw1+pw2) + conv_sep

    x = _crops(4, key=9)
    ref = mbf.apply(params, x, compute_dtype=jnp.bfloat16)
    got = quant.apply_quantized(mbf.apply, params, qstate, x)
    cos = (np.asarray(L.l2_normalize(ref)) * np.asarray(L.l2_normalize(got))).sum(1)
    assert cos.min() > 0.97, cos


def test_api_quantize_roundtrip():
    """FaceRecognizer.quantize() swaps in the int8 path transparently."""
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.pipeline.api import FaceRecognizer

    cfg = PipelineConfig(rec_arch="iresnet18", compute_dtype="float32")
    rec = FaceRecognizer(cfg)
    assert rec.load_model(None)
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (112, 112, 3)).astype(np.uint8)
    ref = rec.extract_feature_simple(img)
    assert rec.quantize()
    got = rec.extract_feature_simple(img)
    assert got.shape == (512,)
    cos = float((ref / np.linalg.norm(ref)) @ (got / np.linalg.norm(got)))
    assert cos > 0.97, cos
    # second quantize on an already-quantized model is refused
    assert not rec.quantize()


def test_strip_selective_by_trace():
    """With min_channels set, only the QUANTIZED convs' f32 weights are
    stripped (positions recovered by an eval_shape re-trace)."""
    from facerecognizeonnx_tpu.models import mobilefacenet as mbf

    params = mbf.fold_inference_params(
        mbf.init_params(jax.random.PRNGKey(20), arch="mbf")
    )
    calib = _crops(4, key=21)
    qstate = quant.quantize_recognizer(mbf.apply, params, calib, min_channels=128)
    assert any(q is None for q in qstate["convs"])  # mixed model
    stripped = quant.strip_quantized_weights(params, qstate, mbf.apply)
    x = _crops(2, key=22)
    a = quant.apply_quantized(mbf.apply, params, qstate, x)
    b = quant.apply_quantized(mbf.apply, stripped, qstate, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    n_full = sum(v.size for v in jax.tree_util.tree_leaves(params))
    n_strip = sum(v.size for v in jax.tree_util.tree_leaves(stripped))
    assert n_strip < n_full  # wide convs stripped
    # depthwise convs keep their weights (they still run in bf16)
    assert stripped["stem_dw"]["conv"]["w"].size > 0
    assert stripped["conv_sep"]["conv"]["w"].size == 0  # 512ch, quantized


def test_strip_quantized_weights(folded_params):
    calib = _crops(4, key=4)
    qstate = quant.quantize_recognizer(arcface.apply, folded_params, calib)
    stripped = quant.strip_quantized_weights(folded_params, qstate)
    x = _crops(2, key=5)
    a = quant.apply_quantized(arcface.apply, folded_params, qstate, x)
    b = quant.apply_quantized(arcface.apply, stripped, qstate, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    n_full = sum(v.size for v in jax.tree_util.tree_leaves(folded_params))
    n_strip = sum(v.size for v in jax.tree_util.tree_leaves(stripped))
    assert n_strip < n_full / 10  # conv/fc weights dominate the count


def test_calibration_data_drives_activation_scales(folded_params):
    """Real-crop calibration must produce different activation scales
    than synthetic noise (the CLI --quant-calib path exists precisely
    because scales are data-dependent), while both stay within
    PTQ-grade cosine of bf16."""
    noise = _crops(16, key=1)
    # "real" stand-in: low-contrast, face-like smooth gradients — a very
    # different activation distribution than full-range uniform noise
    rng = np.random.default_rng(2)
    base = rng.integers(90, 170, (16, 1, 1, 3)).astype(np.float32)
    ramp = np.linspace(-20, 20, 112, dtype=np.float32)
    smooth = base + ramp[None, :, None, None] + ramp[None, None, :, None]
    real = jnp.asarray((np.clip(smooth, 0, 255) - 127.5) / 128.0)

    q_noise = quant.quantize_recognizer(arcface.apply, folded_params, noise)
    q_real = quant.quantize_recognizer(arcface.apply, folded_params, real)

    s_noise = np.array(
        [float(q["in_scale"]) for q in q_noise["convs"] if q is not None]
    )
    s_real = np.array(
        [float(q["in_scale"]) for q in q_real["convs"] if q is not None]
    )
    assert s_noise.shape == s_real.shape and len(s_noise) > 0
    # scales differ materially on most layers
    rel = np.abs(s_noise - s_real) / np.maximum(s_noise, 1e-9)
    assert (rel > 0.05).mean() > 0.5, rel

    # calibrating on the real distribution keeps real-input fidelity
    x = real[:4]
    want = np.asarray(L.l2_normalize(arcface.apply(folded_params, x)))
    got = np.asarray(
        L.l2_normalize(
            quant.apply_quantized(arcface.apply, folded_params, q_real, x)
        )
    )
    cos = (want * got).sum(axis=1)
    assert (cos > 0.95).all(), cos
