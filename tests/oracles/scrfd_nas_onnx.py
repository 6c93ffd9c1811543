"""A faithful det_500m-SHAPED ONNX export + independent torch oracle.

The real buffalo_sc `det_500m.onnx` (reference models/README.md:9-13)
is a torch-exported SCRFD with a NAS'd residual depthwise backbone and
the classic export artifacts the repo's own native models never
exercise (VERDICT r1 item 3):

  * depthwise (group) Convs + pointwise Convs + residual Adds
  * per-output Transpose → Shape→Gather→Div→Unsqueeze→Concat→Reshape
    glue chains computing the target shape dynamically
  * batch-FOLDED 2-D outputs: (H*W*A, C), not (B, H*W*A, C)
  * 9 output tensors (3 strides × {scores, bbox, kps}) in SCRAMBLED
    order with uninformative names

This module builds such a graph from a seeded numpy weight dict,
serializes it with the wire-level writer (onnx_writer.py), and provides
an INDEPENDENT torch forward over the same weights as the numeric
oracle — so OnnxRunner/Executor parity is tested against a different
backend, not against the code that wrote the file.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles import onnx_writer as W

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2

# (kind, args):
#   conv: (cin, cout, k, stride, groups)
# backbone spec with residual connections marked; taps at strides 8/16/32
_BACKBONE = [
    ("conv", 3, 16, 3, 2, 1),        # stem, stride 2
    ("dwsep", 16, 16, 1, True),       # residual dw-sep at stride 2
    ("dwsep", 16, 24, 2, False),      # stride 4
    ("dwsep", 24, 24, 1, True),
    ("dwsep", 24, 40, 2, False),      # stride 8
    ("dwsep", 40, 40, 1, True),       # tap c3
    ("dwsep", 40, 72, 2, False),      # stride 16
    ("dwsep", 72, 72, 1, True),       # tap c4
    ("dwsep", 72, 112, 2, False),     # stride 32
    ("dwsep", 112, 112, 1, True),     # tap c5
]
_TAP_AFTER = {5: 8, 7: 16, 9: 32}  # backbone index → stride
_HEAD_CH = 32


def make_weights(seed: int = 0) -> dict:
    """Seeded numpy weights for the whole net (BN stats non-trivial)."""
    rng = np.random.default_rng(seed)
    w = {}

    def conv(name, cin, cout, k, groups=1):
        fan = k * k * cin // groups
        w[name + ".w"] = (
            rng.standard_normal((cout, cin // groups, k, k)) * (2.0 / fan) ** 0.5
        ).astype(np.float32)
        w[name + ".b"] = (rng.standard_normal(cout) * 0.01).astype(np.float32)

    def bn(name, c):
        w[name + ".scale"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        w[name + ".bias"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        w[name + ".mean"] = (rng.standard_normal(c) * 0.1).astype(np.float32)
        w[name + ".var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)

    for i, spec in enumerate(_BACKBONE):
        if spec[0] == "conv":
            _, cin, cout, k, _s, g = spec
            conv(f"b{i}", cin, cout, k, g)
            bn(f"b{i}.bn", cout)
        else:
            _, cin, cout, _s, _res = spec
            conv(f"b{i}.dw", cin, cin, 3, groups=cin)
            bn(f"b{i}.dwbn", cin)
            conv(f"b{i}.pw", cin, cout, 1)
            bn(f"b{i}.pwbn", cout)
    for s in STRIDES:
        cin = {8: 40, 16: 72, 32: 112}[s]
        conv(f"h{s}.t", cin, _HEAD_CH, 3)
        bn(f"h{s}.tbn", _HEAD_CH)
        conv(f"h{s}.cls", _HEAD_CH, NUM_ANCHORS * 1, 3)
        conv(f"h{s}.box", _HEAD_CH, NUM_ANCHORS * 4, 3)
        conv(f"h{s}.kps", _HEAD_CH, NUM_ANCHORS * 10, 3)
    return w


# ------------------------------------------------------------ torch oracle


def _tbn(w, name, x):
    return F.batch_norm(
        x,
        torch.from_numpy(w[name + ".mean"]),
        torch.from_numpy(w[name + ".var"]),
        torch.from_numpy(w[name + ".scale"]),
        torch.from_numpy(w[name + ".bias"]),
        training=False,
        eps=1e-5,
    )


def _tconv(w, name, x, stride=1, pad=1, groups=1):
    return F.conv2d(
        x,
        torch.from_numpy(w[name + ".w"]),
        torch.from_numpy(w[name + ".b"]),
        stride=stride,
        padding=pad,
        groups=groups,
    )


def torch_forward(w: dict, x_nchw: np.ndarray) -> dict:
    """Independent oracle: {stride: (scores (N,1), bbox (N,4), kps (N,10))}
    batch-folded 2-D arrays, anchor-fastest row order, post-sigmoid."""
    with torch.no_grad():
        x = torch.from_numpy(np.asarray(x_nchw, np.float32))
        taps = {}
        for i, spec in enumerate(_BACKBONE):
            if spec[0] == "conv":
                _, _, _, k, s, g = spec
                x = F.relu(_tbn(w, f"b{i}.bn", _tconv(w, f"b{i}", x, s, k // 2, g)))
            else:
                _, cin, _cout, s, res = spec
                y = _tconv(w, f"b{i}.dw", x, s, 1, groups=cin)
                y = F.relu(_tbn(w, f"b{i}.dwbn", y))
                y = _tconv(w, f"b{i}.pw", y, 1, 0)
                y = _tbn(w, f"b{i}.pwbn", y)
                x = F.relu(x + y) if res else F.relu(y)
            if i in _TAP_AFTER:
                taps[_TAP_AFTER[i]] = x
        outs = {}
        for s in STRIDES:
            h = F.relu(_tbn(w, f"h{s}.tbn", _tconv(w, f"h{s}.t", taps[s], 1, 1)))

            def fold(t, c):
                # NCHW (B, A*C, H, W) → NHWC → (B*H*W*A, C), anchor fastest
                t = t.permute(0, 2, 3, 1)
                return t.reshape(-1, c).numpy()

            cls = torch.sigmoid(_tconv(w, f"h{s}.cls", h, 1, 1))
            box = _tconv(w, f"h{s}.box", h, 1, 1)
            kps = _tconv(w, f"h{s}.kps", h, 1, 1)
            outs[s] = (fold(cls, 1), fold(box, 4), fold(kps, 10))
        return outs


# ------------------------------------------------------------ ONNX emitter


class _E:
    def __init__(self):
        self.nodes, self.inits, self.n = [], [], 0

    def nm(self, tag):
        self.n += 1
        return f"{tag}_{self.n}"

    def init(self, name, arr):
        self.inits.append(W.tensor(name, np.ascontiguousarray(arr)))

    def conv(self, w, name, x, stride, pad, groups=1):
        out = self.nm("conv")
        self.init(out + "_w", w[name + ".w"])
        self.init(out + "_b", w[name + ".b"])
        k = w[name + ".w"].shape[2]
        self.nodes.append(
            W.node(
                "Conv", [x, out + "_w", out + "_b"], [out],
                strides=[stride, stride], pads=[pad] * 4,
                kernel_shape=[k, k], group=groups,
            )
        )
        return out

    def bn(self, w, name, x):
        out = self.nm("bn")
        for sfx, key in (("_g", ".scale"), ("_b", ".bias"), ("_m", ".mean"), ("_v", ".var")):
            self.init(out + sfx, w[name + key])
        self.nodes.append(
            W.node(
                "BatchNormalization",
                [x, out + "_g", out + "_b", out + "_m", out + "_v"],
                [out], epsilon=1e-5,
            )
        )
        return out

    def op(self, op_type, inputs, **attrs):
        out = self.nm(op_type.lower())
        self.nodes.append(W.node(op_type, inputs, [out], **attrs))
        return out


def emit_scrfd_nas_onnx(w: dict, input_size: int) -> tuple:
    """Serialize the graph; returns (model_bytes, output_names_in_order).

    Output heads end in the torch-export glue chain:
      Transpose(0,2,3,1) → Shape → Gather(3) → Div(A) →
      Unsqueeze → Concat([-1], ·) → Reshape
    producing batch-folded (H*W*A, C) tensors; the 9 outputs are emitted
    in scrambled stride/kind order with opaque names.
    """
    e = _E()
    x = "input"
    taps = {}
    for i, spec in enumerate(_BACKBONE):
        if spec[0] == "conv":
            _, _, _, k, s, g = spec
            x = e.op("Relu", [e.bn(w, f"b{i}.bn", e.conv(w, f"b{i}", x, s, k // 2, g))])
        else:
            _, cin, _cout, s, res = spec
            y = e.conv(w, f"b{i}.dw", x, s, 1, groups=cin)
            y = e.op("Relu", [e.bn(w, f"b{i}.dwbn", y)])
            y = e.bn(w, f"b{i}.pwbn", e.conv(w, f"b{i}.pw", y, 1, 0))
            x = e.op("Relu", [e.op("Add", [x, y])]) if res else e.op("Relu", [y])
        if i in _TAP_AFTER:
            taps[_TAP_AFTER[i]] = x

    e.init("neg_one", np.asarray([-1], np.int64))
    e.init("anchors_c", np.asarray([NUM_ANCHORS], np.int64))
    e.init("axis3", np.asarray([3], np.int64))
    # a scalar initializer: wire writer emits (1,); squeeze at use site
    sq = e.op("Squeeze", ["anchors_c"], axes=[0])
    e.nodes.append(W.node("Identity", [sq], ["anchors_c_scalar"]))

    trunks = {
        s: e.op("Relu", [e.bn(w, f"h{s}.tbn", e.conv(w, f"h{s}.t", taps[s], 1, 1))])
        for s in STRIDES
    }

    def head_out(s, kind, cols, final_name):
        t = e.conv(w, f"h{s}.{kind}", trunks[s], 1, 1)
        if kind == "cls":
            t = e.op("Sigmoid", [t])
        perm = e.op("Transpose", [t], perm=[0, 2, 3, 1])
        # glue chain: target shape = [-1, (A*C)/A] computed dynamically
        # (Squeeze reaches the 0-d scalar a torch export's Gather yields;
        # the wire writer can only express ≥1-d initializers)
        shp = e.op("Shape", [perm])
        ac = e.op("Gather", [shp, "axis3"], axis=0)  # (1,) holding A*C
        ac0 = e.op("Squeeze", [ac], axes=[0])  # scalar A*C
        c = e.op("Div", [ac0, "anchors_c_scalar"])
        c1 = e.op("Unsqueeze", [c], axes=[0])
        tgt = e.op("Concat", ["neg_one", c1], axis=0)
        e.nodes.append(W.node("Reshape", [perm, tgt], [final_name]))
        del cols
        return final_name

    # scrambled output order, opaque export-style names
    order = [
        (8, "kps", 10, "471"),
        (32, "cls", 1, "451"),
        (16, "box", 4, "466"),
        (8, "cls", 1, "443"),
        (32, "kps", 10, "473"),
        (8, "box", 4, "462"),
        (16, "cls", 1, "447"),
        (16, "kps", 10, "472"),
        (32, "box", 4, "470"),
    ]
    out_names = [head_out(s, kind, c, nm) for s, kind, c, nm in order]

    g = W.graph(
        e.nodes,
        e.inits,
        [("input", [1, 3, input_size, input_size])],
        [(nm, [None, None]) for nm in out_names],
    )
    return W.model(g), out_names
