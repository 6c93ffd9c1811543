"""ONNX importer tests: wire-format parsing, graph execution vs torch,
and end-to-end API loading of .onnx files — all without the onnx package
(models serialized by tests/oracles/onnx_writer.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from facerecognizeonnx_tpu.onnx_import import proto
from facerecognizeonnx_tpu.onnx_import.executor import Executor
from facerecognizeonnx_tpu.onnx_import.importer import OnnxRunner
from tests.oracles import onnx_writer as W


def _convnet_model(rng):
    """Conv(3→8,s2,p1)+bias → BN → PRelu → depthwise Conv → GAP → Flatten
    → Gemm(8→4). Returns (model_bytes, weights dict)."""
    w = {
        "conv_w": rng.normal(0, 0.2, (8, 3, 3, 3)).astype(np.float32),
        "conv_b": rng.normal(0, 0.1, (8,)).astype(np.float32),
        "bn_scale": rng.uniform(0.5, 1.5, 8).astype(np.float32),
        "bn_bias": rng.normal(0, 0.1, 8).astype(np.float32),
        "bn_mean": rng.normal(0, 0.5, 8).astype(np.float32),
        "bn_var": rng.uniform(0.5, 2.0, 8).astype(np.float32),
        "slope": rng.uniform(0.1, 0.4, 8).astype(np.float32),
        "dw_w": rng.normal(0, 0.2, (8, 1, 3, 3)).astype(np.float32),
        "fc_w": rng.normal(0, 0.2, (8, 4)).astype(np.float32),
        "fc_b": rng.normal(0, 0.1, (4,)).astype(np.float32),
    }
    nodes = [
        W.node("Conv", ["x", "conv_w", "conv_b"], ["c1"],
               strides=[2, 2], pads=[1, 1, 1, 1], kernel_shape=[3, 3]),
        W.node("BatchNormalization",
               ["c1", "bn_scale", "bn_bias", "bn_mean", "bn_var"], ["b1"],
               epsilon=1e-5),
        W.node("PRelu", ["b1", "slope"], ["p1"]),
        W.node("Conv", ["p1", "dw_w"], ["c2"],
               strides=[1, 1], pads=[1, 1, 1, 1], group=8, kernel_shape=[3, 3]),
        W.node("GlobalAveragePool", ["c2"], ["g1"]),
        W.node("Flatten", ["g1"], ["f1"], axis=1),
        W.node("Gemm", ["f1", "fc_w", "fc_b"], ["y"], alpha=1.0, beta=1.0),
    ]
    inits = [
        W.tensor(k, v, use_raw=(i % 2 == 0))  # mix raw_data & typed fields
        for i, (k, v) in enumerate(w.items())
    ]
    g = W.graph(nodes, inits, [("x", [1, 3, 16, 16])], [("y", [1, 4])])
    return W.model(g), w


def _torch_convnet(w, x):
    with torch.no_grad():
        t = {k: torch.from_numpy(v) for k, v in w.items()}
        y = F.conv2d(torch.from_numpy(x), t["conv_w"], t["conv_b"], 2, 1)
        y = F.batch_norm(y, t["bn_mean"], t["bn_var"], t["bn_scale"],
                         t["bn_bias"], False, eps=1e-5)
        y = F.prelu(y, t["slope"])
        y = F.conv2d(y, t["dw_w"], None, 1, 1, groups=8)
        y = y.mean((2, 3))
        y = y @ t["fc_w"] + t["fc_b"]
        return y.numpy()


def test_parse_roundtrip(rng):
    data, w = _convnet_model(rng)
    g = proto.parse_model(data)
    assert [n.op_type for n in g.nodes] == [
        "Conv", "BatchNormalization", "PRelu", "Conv",
        "GlobalAveragePool", "Flatten", "Gemm",
    ]
    assert set(g.initializers) == set(w)
    for k in w:
        np.testing.assert_array_equal(g.initializers[k], w[k])
    assert g.inputs[0] == ("x", [1, 3, 16, 16])
    assert g.outputs == ["y"]
    assert g.nodes[0].attrs["strides"] == [2, 2]
    assert g.nodes[1].attrs["epsilon"] == pytest.approx(1e-5)


def test_executor_matches_torch(rng):
    data, w = _convnet_model(rng)
    g = proto.parse_model(data)
    x = rng.normal(0, 1, (1, 3, 16, 16)).astype(np.float32)
    got = np.asarray(Executor(g).run({"x": x})[0])
    ref = _torch_convnet(w, x)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_executor_under_jit(rng):
    import jax
    import jax.numpy as jnp

    data, _ = _convnet_model(rng)
    g = proto.parse_model(data)
    ex = Executor(g)
    fn = jax.jit(lambda x: ex.run({"x": x})[0])
    x = rng.normal(0, 1, (1, 3, 16, 16)).astype(np.float32)
    eager = np.asarray(ex.run({"x": x})[0])
    jitted = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_allclose(jitted, eager, atol=1e-5)


def test_unsupported_op_reports_name(rng):
    nodes = [W.node("TotallyFakeOp", ["x"], ["y"])]
    g = proto.parse_model(
        W.model(W.graph(nodes, [], [("x", [1])], [("y", [1])]))
    )
    with pytest.raises(NotImplementedError, match="TotallyFakeOp"):
        Executor(g).run({"x": np.zeros(1, np.float32)})


def _arcface_like_model(rng, dim=512):
    """(1,3,112,112) → GAP → Flatten → Gemm(3→dim): tiny but shaped like
    a recognizer export for the API path."""
    w = rng.normal(0, 0.3, (3, dim)).astype(np.float32)
    nodes = [
        W.node("GlobalAveragePool", ["input"], ["g"]),
        W.node("Flatten", ["g"], ["f"], axis=1),
        W.node("Gemm", ["f", "w"], ["feat"]),
    ]
    g = W.graph(nodes, [W.tensor("w", w)],
                [("input", [1, 3, 112, 112])], [("feat", [1, dim])])
    return W.model(g), w


def _scrfd_like_model(rng, size=64):
    """Three stride branches emitting the 9-output det_500m contract:
    AveragePool(s) → 1x1 Conv → Transpose → Reshape (+Sigmoid on scores)."""
    nodes, inits = [], []
    outputs = []
    for stride in (8, 16, 32):
        hw = size // stride
        rows = 2 * hw * hw
        for cols, tag_ in ((1, "score"), (4, "bbox"), (10, "kps")):
            cname = f"{tag_}_{stride}"
            wname = f"w_{cname}"
            inits.append(W.tensor(
                wname, rng.normal(0, 0.3, (2 * cols, 3, 1, 1)).astype(np.float32)
            ))
            inits.append(W.tensor(
                f"shape_{cname}", np.array([1, rows, cols], np.int64)
            ))
            nodes.append(W.node("AveragePool", ["input"], [f"p_{cname}"],
                                kernel_shape=[stride, stride],
                                strides=[stride, stride]))
            nodes.append(W.node("Conv", [f"p_{cname}", wname], [f"c_{cname}"],
                                kernel_shape=[1, 1], strides=[1, 1]))
            nodes.append(W.node("Transpose", [f"c_{cname}"], [f"t_{cname}"],
                                perm=[0, 2, 3, 1]))
            nodes.append(W.node("Reshape", [f"t_{cname}", f"shape_{cname}"],
                                [f"r_{cname}"]))
            if tag_ == "score":
                nodes.append(W.node("Sigmoid", [f"r_{cname}"], [cname]))
            else:
                nodes.append(W.node("Identity", [f"r_{cname}"], [cname]))
            outputs.append((cname, [1, rows, cols]))
    g = W.graph(nodes, inits, [("input", [1, 3, size, size])], outputs)
    return W.model(g)


def test_onnx_runner_arcface_kind(tmp_path, rng):
    data, w = _arcface_like_model(rng)
    path = str(tmp_path / "rec.onnx")
    open(path, "wb").write(data)
    runner = OnnxRunner(path)
    assert runner.kind == "arcface"
    import jax.numpy as jnp

    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    feats = np.asarray(runner.apply(jnp.asarray(x)))
    assert feats.shape == (2, 512)
    ref = x.transpose(0, 3, 1, 2).mean((2, 3)) @ w
    np.testing.assert_allclose(feats, ref, atol=1e-4)


def test_onnx_runner_scrfd_classification(tmp_path, rng):
    data = _scrfd_like_model(rng, size=64)
    path = str(tmp_path / "det.onnx")
    open(path, "wb").write(data)
    runner = OnnxRunner(path, kind="scrfd")
    import jax.numpy as jnp

    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    outs = runner.apply(jnp.asarray(x))
    assert set(outs) == {8, 16, 32}
    for stride, (s, b, k) in outs.items():
        rows = 2 * (64 // stride) ** 2
        assert s.shape == (1, rows, 1)
        assert b.shape == (1, rows, 4)
        assert k.shape == (1, rows, 10)
        sv = np.asarray(s)
        assert 0 <= sv.min() and sv.max() <= 1


def test_api_loads_onnx_detector(tmp_path, rng):
    """Full detect() through a real .onnx file: parse → execute → decode
    → NMS, exercising the C2/C4/C5 chain with an imported graph."""
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector

    data = _scrfd_like_model(rng, size=640)
    path = str(tmp_path / "det_500m.onnx")
    open(path, "wb").write(data)
    cfg = PipelineConfig(compute_dtype="float32")
    det = FaceDetector(cfg)
    assert det.load_model(path)
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    faces = det.detect(img)
    assert isinstance(faces, list)  # count arbitrary with random conv weights
    for f in faces[:2]:
        assert f.landmarks.shape == (5, 2)


def test_api_loads_onnx_recognizer(tmp_path, rng):
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.pipeline.api import FaceRecognizer

    data, _ = _arcface_like_model(rng)
    path = str(tmp_path / "w600k_r50.onnx")
    open(path, "wb").write(data)
    rec = FaceRecognizer(PipelineConfig(compute_dtype="float32"))
    assert rec.load_model(path)
    img = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    feat = rec.extract_feature_simple(img)
    assert feat.shape == (512,)
    assert np.linalg.norm(feat) == pytest.approx(1.0, abs=1e-5)
