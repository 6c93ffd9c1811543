"""Shim: emit_mobilefacenet_onnx was productized into onnx_export/emit.py."""

from facerecognizeonnx_tpu.onnx_export.emit import (  # noqa: F401
    emit_mobilefacenet_onnx,
)
