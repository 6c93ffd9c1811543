"""ONNX model import without onnxruntime or the onnx package.

The reference's entire model layer is two opaque .onnx files executed by
ONNX Runtime (reference: src/face_detector.cpp:20-90, models/README.md).
This package replaces that dependency with:

  proto.py    — a minimal protobuf wire-format reader for the ONNX
                schema subset (ModelProto/GraphProto/NodeProto/
                TensorProto/AttributeProto)
  executor.py — a graph executor compiling ONNX ops to jnp/lax (jit-able)
  importer.py — user-facing loaders: OnnxRunner objects that plug into
                the detect/embed pipelines with the same output
                contracts as the native models
"""

from facerecognizeonnx_tpu.onnx_import.importer import OnnxRunner, load_onnx_params

__all__ = ["OnnxRunner", "load_onnx_params"]
