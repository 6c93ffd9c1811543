"""Dependency-free ONNX protobuf writer (wire-format encoder).

The reference CONSUMES .onnx files through ONNX Runtime (reference
src/face_detector.cpp:20-90, src/face_recognizer.cpp:21-91); this
framework additionally PRODUCES them — trained or imported models
export back to ONNX so existing ORT/InsightFace deployments can load
them (onnx_export/emit.py). No `onnx` package exists in the image, so
serialization is done at the protobuf wire level (field numbers per
onnx.proto3); it is the encoding counterpart of the independent decoder
in onnx_import/proto.py, and each side round-trip-tests the other
(tests/test_onnx_import.py, tests/test_native_map.py,
tests/test_onnx_export.py).
"""

from __future__ import annotations

import struct

import numpy as np

NP_TO_ONNX_DTYPE = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _float_field(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def tensor(name: str, arr: np.ndarray, use_raw: bool = True) -> bytes:
    arr = np.ascontiguousarray(arr)
    out = b""
    for d in arr.shape:
        out += _varint_field(1, d)
    out += _varint_field(2, NP_TO_ONNX_DTYPE[arr.dtype])
    out += _len_field(8, name.encode())
    if use_raw:
        out += _len_field(9, arr.tobytes())
    elif arr.dtype == np.float32:
        out += _len_field(4, arr.tobytes())  # packed float_data
    elif arr.dtype == np.int64:
        payload = b"".join(_varint(int(v)) for v in arr.ravel())
        out += _len_field(7, payload)
    else:
        raise ValueError(f"non-raw serialization unsupported for {arr.dtype}")
    return out


def _attribute(name: str, value) -> bytes:
    out = _len_field(1, name.encode())
    if isinstance(value, bool):
        out += _varint_field(3, int(value))
    elif isinstance(value, int):
        out += _varint_field(3, value)
    elif isinstance(value, float):
        out += _float_field(2, value)
    elif isinstance(value, bytes):
        out += _len_field(4, value)
    elif isinstance(value, str):
        out += _len_field(4, value.encode())
    elif isinstance(value, np.ndarray):
        out += _len_field(5, tensor("", value))
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:  # repeated (non-packed) ints
                out += _varint_field(8, v)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                out += _tag(7, 5) + struct.pack("<f", v)
        else:
            raise ValueError(f"unsupported attr list {value!r}")
    else:
        raise ValueError(f"unsupported attr {value!r}")
    return out


def node(op_type: str, inputs, outputs, name: str = "", **attrs) -> bytes:
    out = b""
    for i in inputs:
        out += _len_field(1, i.encode())
    for o in outputs:
        out += _len_field(2, o.encode())
    # empty node names are spec-legal and exempt from the graph-level
    # uniqueness rule; defaulting to op_type gave every Conv the same
    # (duplicate) name, which the ONNX checker rejects
    if name:
        out += _len_field(3, name.encode())
    out += _len_field(4, op_type.encode())
    for k, v in attrs.items():
        out += _len_field(5, _attribute(k, v))
    return out


def _value_info(name: str, shape, elem_type: int = 1) -> bytes:
    dims = b""
    for d in shape:
        dim = _varint_field(1, d) if d is not None and d >= 0 else b""
        dims += _len_field(1, dim)
    tensor_type = _varint_field(1, elem_type) + _len_field(2, dims)
    type_proto = _len_field(1, tensor_type)
    return _len_field(1, name.encode()) + _len_field(2, type_proto)


def graph(nodes, initializers, inputs, outputs, name="testgraph") -> bytes:
    out = b""
    for n in nodes:
        out += _len_field(1, n)
    out += _len_field(2, name.encode())
    for init in initializers:
        out += _len_field(5, init)
    for in_name, in_shape in inputs:
        out += _len_field(11, _value_info(in_name, in_shape))
    for out_name, out_shape in outputs:
        out += _len_field(12, _value_info(out_name, out_shape))
    return out


def model(graph_bytes: bytes, opset_version: int = 8) -> bytes:
    """ModelProto: ir_version + graph + opset_import.

    ONNX requires ≥1 opset_import for ir_version≥4 — stock ONNX Runtime
    (the reference's Ort::Session loader, src/face_recognizer.cpp:25)
    rejects models without one ("Missing opset in the model"). Default
    pinned to opset 8 because emit_scrfd_onnx uses the attribute-form
    Upsample (scales moved to an input in opset 9, op deprecated in 10).
    """
    out = _varint_field(1, 8)  # ir_version
    # OperatorSetIdProto: domain (field 1, "" = ai.onnx), version (field 2)
    opset = _len_field(1, b"") + _varint_field(2, opset_version)
    out += _len_field(8, opset)
    out += _len_field(7, graph_bytes)
    return out
