"""ONNX export: native TPU models → .onnx files.

The reference ecosystem runs .onnx through ONNX Runtime (reference
src/main.cpp:269-284 loads det_500m.onnx / w600k_r50.onnx); this
package closes the interop loop in the other direction — models trained
or fine-tuned in this framework (train/) export to the same
torch-export-shaped graphs, loadable by the reference binary unchanged.

    from facerecognizeonnx_tpu import onnx_export
    onnx_export.export_recognizer(params, "my_w600k.onnx")

Export UNFOLDED params (with BNs); a folded inference pytree has no BN
tensors to serialize and is rejected with a clear error.
"""

from __future__ import annotations

from typing import Dict, Optional

from facerecognizeonnx_tpu.onnx_export.emit import (
    emit_iresnet_onnx,
    emit_mobilefacenet_onnx,
    emit_scrfd_onnx,
)


def _iresnet_arch_of(params: Dict) -> str:
    from facerecognizeonnx_tpu.models.arcface import IRESNET_SPECS

    depth = tuple(len(params[f"layer{s}"]) for s in (1, 2, 3, 4))
    for arch, (blocks, _w) in IRESNET_SPECS.items():
        if blocks == depth:
            return arch
    raise ValueError(f"unrecognized iresnet stage depths {depth}")


def export_recognizer(
    params: Dict,
    path: Optional[str] = None,
    input_size: int = 112,
) -> bytes:
    """Serialize recognizer params (IResNet, MobileFaceNet, or ViT,
    dispatched on pytree structure like models.recognizer_apply) to
    ONNX bytes (ViT: decomposed-LN opset-9 graph, emit.emit_vit_onnx);
    also writes `path` when given. Raises ValueError on folded params —
    re-import the original weights or keep the unfolded pytree around.
    """
    from facerecognizeonnx_tpu.errors import ModelLoadError  # noqa: F401

    if hasattr(params, "apply"):
        raise ValueError(
            "params is an executor/quantized wrapper — export needs the "
            "native unfolded pytree"
        )
    if "features_bn" not in params:
        raise ValueError(
            "params look BN-folded (no features_bn): export needs UNFOLDED "
            "params — the .onnx carries explicit BatchNormalization nodes"
        )
    if "body" in params:
        data = emit_mobilefacenet_onnx(params, input_size=input_size)
    elif "layer1" in params:
        data = emit_iresnet_onnx(params, _iresnet_arch_of(params), input_size)
    elif "pos_embed" in params:
        from facerecognizeonnx_tpu.onnx_export.emit import emit_vit_onnx

        data = emit_vit_onnx(params, input_size=input_size)
    else:
        raise ValueError("unrecognized recognizer param structure")
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data


def export_detector(
    params: Dict,
    path: Optional[str] = None,
    input_size: int = 640,
) -> bytes:
    """Serialize SCRFD detector params to a canonical 9-output det_*
    ONNX graph (round-trips bit-exactly through the importer's
    OnnxRunner — tests/test_onnx_export.py). Unfolded params only.
    s2d variants export via an ONNX SpaceToDepth stem node
    (tests/test_onnx_export.py::test_export_detector_s2d_variant).
    """
    if hasattr(params, "apply"):
        raise ValueError(
            "params is an executor wrapper — export needs the native "
            "unfolded pytree"
        )
    data = emit_scrfd_onnx(params, input_size=input_size)
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data
