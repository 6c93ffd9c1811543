"""Emit an IResNet .onnx (torch-export-shaped) from native params.

The exact inverse of onnx_import/native_map.py: forward-execution node
order, OIHW weights, CHW-flatten Gemm — so the mapper's round-trip can
be tested without torch.onnx/onnx being installed."""

from __future__ import annotations

import numpy as np

from facerecognizeonnx_tpu.models.arcface import IRESNET_SPECS
from tests.oracles import onnx_writer as W


class _Emitter:
    def __init__(self):
        self.nodes = []
        self.inits = []
        self.n = 0

    def name(self, tag_):
        self.n += 1
        return f"{tag_}_{self.n}"

    def conv(self, x, p, stride, pad, groups=1):
        out = self.name("conv")
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO→OIHW
        wn = out + "_w"
        self.inits.append(W.tensor(wn, np.ascontiguousarray(w)))
        inputs = [x, wn]
        if "b" in p:
            bn_ = out + "_b"
            self.inits.append(W.tensor(bn_, np.asarray(p["b"])))
            inputs.append(bn_)
        kh = w.shape[2]
        attrs = dict(strides=[stride, stride], pads=[pad] * 4,
                     kernel_shape=[kh, kh])
        if groups != 1:  # torch exports group=1 implicitly otherwise
            attrs["group"] = groups
        self.nodes.append(W.node("Conv", inputs, [out], **attrs))
        return out

    def bn(self, x, p):
        out = self.name("bn")
        names = []
        for suffix, key in (("_g", "scale"), ("_b", "bias"), ("_m", "mean"), ("_v", "var")):
            nm = out + suffix
            self.inits.append(W.tensor(nm, np.asarray(p[key])))
            names.append(nm)
        self.nodes.append(
            W.node("BatchNormalization", [x] + names, [out], epsilon=1e-5)
        )
        return out

    def prelu(self, x, p):
        out = self.name("prelu")
        nm = out + "_s"
        # torch exports slope as (C, 1, 1)
        self.inits.append(
            W.tensor(nm, np.asarray(p["alpha"]).reshape(-1, 1, 1))
        )
        self.nodes.append(W.node("PRelu", [x, nm], [out]))
        return out


def emit_iresnet_onnx(params, arch: str, input_size: int) -> bytes:
    blocks, widths = IRESNET_SPECS[arch]
    e = _Emitter()
    x = e.conv("input", params["conv1"], 1, 1)
    x = e.bn(x, params["bn1"])
    x = e.prelu(x, params["prelu1"])
    for s, n in enumerate(blocks, start=1):
        for b in range(n):
            blk = params[f"layer{s}"][b]
            stride = 2 if b == 0 else 1
            identity = x
            out = e.bn(x, blk["bn1"])
            out = e.conv(out, blk["conv1"], 1, 1)
            out = e.bn(out, blk["bn2"])
            out = e.prelu(out, blk["prelu"])
            out = e.conv(out, blk["conv2"], stride, 1)
            out = e.bn(out, blk["bn3"])
            if "down_conv" in blk:
                identity = e.conv(x, blk["down_conv"], stride, 0)
                identity = e.bn(identity, blk["down_bn"])
            summed = e.name("add")
            e.nodes.append(W.node("Add", [out, identity], [summed]))
            x = summed
    x = e.bn(x, params["bn2"])
    flat = e.name("flatten")
    e.nodes.append(W.node("Flatten", [x], [flat], axis=1))
    # native fc: (in_hwc, out) → onnx Gemm transB=1 weight (out, in_chw)
    spatial = input_size // 16
    c = widths[-1]
    w_native = np.asarray(params["fc"]["w"])  # (in_hwc, out)
    out_dim = w_native.shape[1]
    w = w_native.T.reshape(out_dim, spatial, spatial, c)
    w = np.transpose(w, (0, 3, 1, 2)).reshape(out_dim, -1)
    e.inits.append(W.tensor("fc_w", np.ascontiguousarray(w)))
    e.inits.append(W.tensor("fc_b", np.asarray(params["fc"]["b"])))
    gemm_out = e.name("gemm")
    e.nodes.append(
        W.node("Gemm", [flat, "fc_w", "fc_b"], [gemm_out],
               alpha=1.0, beta=1.0, transB=1)
    )
    feat = e.bn(gemm_out, params["features_bn"])
    g = W.graph(
        e.nodes, e.inits,
        [("input", [1, 3, input_size, input_size])],
        [(feat, [1, out_dim])],
    )
    return W.model(g)
