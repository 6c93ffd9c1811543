"""Emit a MobileFaceNet .onnx (torch-export-shaped) from native params.

Mirrors how insightface's torch MobileFaceNet exports: forward node
order, OIHW weights, group Convs for the depthwise stages, GDC head as
a 7x7 group-512 Conv → Flatten → Gemm(no bias) → BatchNorm. Used to
prove the generic executor runs a w600k_mbf-shaped graph
(reference src/face_recognizer.cpp:279-283 drives the real file)."""

from __future__ import annotations

import numpy as np

from facerecognizeonnx_tpu.models.mobilefacenet import MBF_SPECS, _body_plan
from tests.oracles import onnx_writer as W
from tests.oracles.iresnet_onnx import _Emitter


def emit_mobilefacenet_onnx(params, input_size: int = 112) -> bytes:
    blocks, scale = next(
        (b, s)
        for b, s in MBF_SPECS.values()
        if len(_body_plan(b, s)) == len(params["body"])
    )
    plan = _body_plan(blocks, scale)
    e = _Emitter()

    def cbp(x, p, stride=1, pad=0, groups=1):
        x = e.conv(x, p["conv"], stride, pad, groups=groups)
        x = e.bn(x, p["bn"])
        return e.prelu(x, p["prelu"])

    x = cbp("input", params["stem"], 2, 1)
    x = cbp(x, params["stem_dw"], 1, 1, groups=64)
    for (_cin, _cout, g, stride), blk in zip(plan, params["body"]):
        y = e.conv(x, blk["pw1"], 1, 0)
        y = e.bn(y, blk["pw1_bn"])
        y = e.prelu(y, blk["pw1_prelu"])
        y = e.conv(y, blk["dw"], stride, 1, groups=g)
        y = e.bn(y, blk["dw_bn"])
        y = e.prelu(y, blk["dw_prelu"])
        y = e.conv(y, blk["pw2"], 1, 0)
        y = e.bn(y, blk["pw2_bn"])
        if stride == 1:
            summed = e.name("add")
            e.nodes.append(W.node("Add", [x, y], [summed]))
            x = summed
        else:
            x = y
    x = cbp(x, params["conv_sep"], 1, 0)
    x = e.conv(x, params["gdc_dw"]["conv"], 1, 0, groups=512)
    x = e.bn(x, params["gdc_dw"]["bn"])

    flat = e.name("flatten")
    e.nodes.append(W.node("Flatten", [x], [flat], axis=1))
    # GDC output is (B, 512, 1, 1) → CHW flatten == channel order, so the
    # native (512, out) FC transposes directly to Gemm transB weight
    w_native = np.asarray(params["fc"]["w"])  # (512, out)
    out_dim = w_native.shape[1]
    e.inits.append(W.tensor("fc_w", np.ascontiguousarray(w_native.T)))
    gemm_out = e.name("gemm")
    e.nodes.append(
        W.node("Gemm", [flat, "fc_w"], [gemm_out], alpha=1.0, beta=1.0,
               transB=1)
    )
    feat = e.bn(gemm_out, params["features_bn"])
    g = W.graph(
        e.nodes, e.inits,
        [("input", [1, 3, input_size, input_size])],
        [(feat, [1, out_dim])],
    )
    return W.model(g)
