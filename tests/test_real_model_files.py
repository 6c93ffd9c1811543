"""Auto-arming real-model parity gate (VERDICT r3 item 3).

The real buffalo_sc files (det_500m.onnx / w600k_r50.onnx — the product
contract of reference src/main.cpp:269-270) have never shipped in this
image, so end-to-end parity on them is unprovable today. These tests
make the proof automatic: the real-file test SKIPS VISIBLY while the
files are absent and runs the full detect/embed/compare parity the
moment any future image ships them (drop them in ./models or point
FRT_REAL_MODELS_DIR at them); the stand-in test proves the gate
actually fires by synthesizing export-shaped files and arming it.
"""

import os

import numpy as np
import jax
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.utils.realmodels import (
    find_real_models,
    run_real_model_parity,
)


def test_real_buffalo_files_parity():
    """ARMED AUTOMATICALLY: full parity on the real det_500m.onnx +
    w600k_r50.onnx when an image ships them; visible skip until then."""
    found = find_real_models()
    if found is None:
        pytest.skip(
            "real buffalo_sc model files absent (set FRT_REAL_MODELS_DIR "
            "or place det_500m.onnx + w600k_r50.onnx in ./models)"
        )
    report = run_real_model_parity(found["det"], found["rec"])
    assert report["recognizer"]["exec_cosine"] > 1 - 1e-3
    assert report["detector"]["input_size"] == 640


def test_gate_fires_on_standin_files(tmp_path, monkeypatch):
    """Prove the gate's machinery end-to-end by dropping synthetic
    stand-ins (export-shaped det NAS-glue graph + w600k-shaped IResNet)
    under the real filenames and pointing FRT_REAL_MODELS_DIR at them:
    find_real_models must arm, and run_real_model_parity must pass with
    the recognizer taking the native-map fast path."""
    from facerecognizeonnx_tpu.models import arcface
    from facerecognizeonnx_tpu.onnx_export import export_recognizer
    from tests.oracles import scrfd_nas_onnx as S

    size = 192  # strides 8/16/32 → 24/12/6; decode is size-agnostic
    blob, _ = S.emit_scrfd_nas_onnx(S.make_weights(seed=3), size)
    (tmp_path / "det_500m.onnx").write_bytes(blob)
    params = arcface.init_params(
        jax.random.PRNGKey(5), arch="iresnet18", input_size=64
    )
    export_recognizer(
        jax.device_get(params), str(tmp_path / "w600k_r50.onnx"),
        input_size=64,
    )

    monkeypatch.setenv("FRT_REAL_MODELS_DIR", str(tmp_path))
    found = find_real_models()
    assert found is not None and found["dir"] == str(tmp_path)
    assert found["det"].endswith("det_500m.onnx")

    cfg = PipelineConfig(
        det_input_size=size, rec_arch="iresnet18", rec_input_size=64,
        compute_dtype="float32", pre_nms_topk=256,
    )
    report = run_real_model_parity(found["det"], found["rec"], cfg)
    assert report["recognizer"]["mapped_native"] is True
    assert report["recognizer"]["exec_cosine"] > 1 - 1e-3
    assert abs(report["recognizer"]["self_sim"] - 1.0) < 1e-5


def _standin_files(tmp_path):
    """Synthetic export-shaped det/rec files under the real names +
    the cfg that matches them (shared by the ORT-branch tests)."""
    from facerecognizeonnx_tpu.models import arcface
    from facerecognizeonnx_tpu.onnx_export import export_recognizer
    from tests.oracles import scrfd_nas_onnx as S

    size = 192
    blob, _ = S.emit_scrfd_nas_onnx(S.make_weights(seed=3), size)
    (tmp_path / "det_500m.onnx").write_bytes(blob)
    params = arcface.init_params(
        jax.random.PRNGKey(5), arch="iresnet18", input_size=64
    )
    export_recognizer(
        jax.device_get(params), str(tmp_path / "w600k_r50.onnx"),
        input_size=64,
    )
    cfg = PipelineConfig(
        det_input_size=size, rec_arch="iresnet18", rec_input_size=64,
        compute_dtype="float32", pre_nms_topk=256,
    )
    return cfg


def _install_ort_stub(monkeypatch, wrong: bool = False):
    """A stand-in `onnxruntime` whose InferenceSession answers with the
    NCHW-reference executor's outputs (the gate can't tell it from real
    ORT — same API, same layout semantics). wrong=True returns garbage
    so the gate must FAIL, proving the oracle is load-bearing."""
    import sys
    import types

    import jax.numpy as jnp

    from facerecognizeonnx_tpu.onnx_import.importer import OnnxRunner

    stub = types.ModuleType("onnxruntime")

    class InferenceSession:
        def __init__(self, path, providers=None):
            self._r = OnnxRunner(path, fast=False)

        def get_inputs(self):
            return [types.SimpleNamespace(name=self._r.input_name)]

        def run(self, _outputs, feeds):
            x = jnp.asarray(feeds[self._r.input_name])
            outs = self._r.executor.run({self._r.input_name: x})
            outs = [np.asarray(o) for o in outs]
            if wrong:
                outs = [np.zeros_like(o) for o in outs]
            return outs

    stub.InferenceSession = InferenceSession
    monkeypatch.setitem(sys.modules, "onnxruntime", stub)


def test_ort_oracle_branch_fires_when_importable(tmp_path, monkeypatch):
    """VERDICT r4 item 6: with an importable `onnxruntime`, the gate
    cross-checks BOTH models against ORT outputs (the genuinely
    independent BASELINE oracle) instead of only executor-vs-executor —
    report says so and carries the ORT deltas."""
    cfg = _standin_files(tmp_path)
    _install_ort_stub(monkeypatch)
    report = run_real_model_parity(
        str(tmp_path / "det_500m.onnx"), str(tmp_path / "w600k_r50.onnx"), cfg
    )
    assert report["oracle"] == "onnxruntime"
    assert report["detector"]["fast_vs_ort_maxdiff"] < 1e-2
    assert report["recognizer"]["ort_cosine"] > 1 - 1e-3


def test_ort_oracle_divergence_fails_the_gate(tmp_path, monkeypatch):
    """A disagreeing ORT oracle must fail the gate — the cross-check is
    load-bearing, not decorative."""
    cfg = _standin_files(tmp_path)
    _install_ort_stub(monkeypatch, wrong=True)
    with pytest.raises(AssertionError, match="onnxruntime"):
        run_real_model_parity(
            str(tmp_path / "det_500m.onnx"),
            str(tmp_path / "w600k_r50.onnx"), cfg,
        )


def test_gate_stays_dormant_without_files(tmp_path, monkeypatch):
    """With no env var and no models/ anywhere reachable, the finder
    returns None (the skip path doctor and the real-file test report)."""
    monkeypatch.delenv("FRT_REAL_MODELS_DIR", raising=False)
    monkeypatch.chdir(tmp_path)
    # only fires if a future image ships the real files at a default
    # location — then the DORMANT assertion is wrong by design and this
    # test retires
    if find_real_models() is not None:
        pytest.skip("real files present — gate armed, dormancy N/A")
    assert find_real_models(model_dir=str(tmp_path)) is None


def test_gate_rejects_partial_dir(tmp_path, monkeypatch):
    """One file of the pair is not enough to arm the gate."""
    monkeypatch.delenv("FRT_REAL_MODELS_DIR", raising=False)
    monkeypatch.chdir(tmp_path)
    if find_real_models() is not None:
        pytest.skip("real files present at a default location")
    (tmp_path / "det_500m.onnx").write_bytes(b"not really onnx")
    assert find_real_models(model_dir=str(tmp_path)) is None
