"""Shim: the wire writer was productized into the package (round 2) —
tests keep importing it from here so the oracle call sites read the
same. Encoder/decoder independence is unchanged: the encoder lives in
onnx_export/writer.py, the decoder it exercises in onnx_import/proto.py."""

from facerecognizeonnx_tpu.onnx_export.writer import (  # noqa: F401
    NP_TO_ONNX_DTYPE,
    _attribute,
    _float_field,
    _len_field,
    _tag,
    _value_info,
    _varint,
    _varint_field,
    graph,
    model,
    node,
    tensor,
)
