"""Property-based importer/executor fuzz (round-3 roadmap item).

Random graphs assembled from the emitter's building blocks (Conv with
stride/groups/bias variants, BN, PRelu, activations, pooling, residual
Add, Upsample, SpaceToDepth, Gemm head) are serialized at the protobuf
wire level (onnx_export/writer.py), parsed back (onnx_import/proto.py)
and executed by BOTH executor modes (reference NCHW and the NHWC fast
path) against an INDEPENDENT torch forward of the same spec. On
mismatch the failing spec is shrunk to the minimal failing prefix and
reported. Seeds are fixed — failures reproduce.
"""

import numpy as np
import pytest

from facerecognizeonnx_tpu.onnx_export import writer as W
from facerecognizeonnx_tpu.onnx_import import proto
from facerecognizeonnx_tpu.onnx_import.executor import Executor

N_GRAPHS = 50
IN_SIZE = 16
IN_CH = 3


# --------------------------------------------------------------- spec gen

def _gen_spec(rng, max_steps=7):
    """A spec is a list of layer dicts; shapes tracked so every op is
    valid. Residual 'add' links back to an earlier same-shape tensor."""
    steps = []
    c, h = IN_CH, IN_SIZE
    shapes = [(c, h)]  # per-step output shapes, index 0 = input
    n = int(rng.integers(2, max_steps + 1))
    for _ in range(n):
        choices = ["conv", "bn", "prelu", "relu", "leakyrelu", "sigmoid",
                   "mul", "clip"]
        if h >= 4 and h % 2 == 0:
            choices += ["maxpool", "avgpool", "s2d"]
        if h <= 16:
            choices.append("upsample")
        same = [i for i, s in enumerate(shapes[:-1]) if s == (c, h)]
        if same:
            choices.append("add")
        op = rng.choice(choices)
        if op == "conv":
            k = int(rng.choice([1, 3]))
            stride = int(rng.choice([1, 2])) if h >= 4 else 1
            groups = int(rng.choice([1, c])) if k == 3 and c > 1 else 1
            cout = int(rng.choice([4, 6, 8])) * (groups if groups > 1 else 1)
            if groups > 1:
                cout = c  # depthwise
            pad = k // 2
            steps.append({"op": "conv", "k": k, "stride": stride,
                          "groups": groups, "cin": c, "cout": cout,
                          "pad": pad, "bias": bool(rng.integers(2))})
            c, h = cout, (h + 2 * pad - k) // stride + 1
        elif op == "bn":
            steps.append({"op": "bn", "c": c})
        elif op == "prelu":
            steps.append({"op": "prelu", "c": c})
        elif op in ("relu", "leakyrelu", "sigmoid"):
            steps.append({"op": op})
        elif op == "mul":
            steps.append({"op": "mul", "v": float(rng.uniform(0.5, 1.5))})
        elif op == "clip":
            steps.append({"op": "clip", "lo": -1.0, "hi": 1.0})
        elif op in ("maxpool", "avgpool"):
            steps.append({"op": op})
            h //= 2
        elif op == "s2d":
            steps.append({"op": "s2d"})
            c, h = c * 4, h // 2
        elif op == "upsample":
            steps.append({"op": "upsample"})
            h *= 2
        elif op == "add":
            steps.append({"op": "add", "src": int(rng.choice(same))})
        shapes.append((c, h))
    steps.append({"op": "head", "cin": c, "h": h, "out": 8,
                  "trans_b": bool(rng.integers(2)),
                  "bias": bool(rng.integers(2))})
    return steps


def _gen_weights(rng, steps):
    ws = []
    for s in steps:
        if s["op"] == "conv":
            fan = s["cin"] // s["groups"] * s["k"] * s["k"]
            w = rng.normal(0, 1.0 / np.sqrt(fan),
                           (s["cout"], s["cin"] // s["groups"], s["k"], s["k"]))
            b = rng.normal(0, 0.1, (s["cout"],)) if s["bias"] else None
            ws.append({"w": w.astype(np.float32),
                       "b": None if b is None else b.astype(np.float32)})
        elif s["op"] == "bn":
            ws.append({
                "scale": rng.uniform(0.5, 1.5, s["c"]).astype(np.float32),
                "bias": rng.normal(0, 0.2, s["c"]).astype(np.float32),
                "mean": rng.normal(0, 0.2, s["c"]).astype(np.float32),
                "var": rng.uniform(0.5, 1.5, s["c"]).astype(np.float32),
            })
        elif s["op"] == "prelu":
            ws.append({"alpha": rng.uniform(0.1, 0.4, s["c"]).astype(np.float32)})
        elif s["op"] == "head":
            fan = s["cin"] * s["h"] * s["h"]
            w = rng.normal(0, 1.0 / np.sqrt(fan),
                           (s["out"], fan)).astype(np.float32)
            b = (rng.normal(0, 0.1, (s["out"],)).astype(np.float32)
                 if s["bias"] else None)
            ws.append({"w": w, "b": b})
        else:
            ws.append(None)
    return ws


# ------------------------------------------------------------- onnx emit

def _emit(steps, ws):
    nodes, inits = [], []
    names = ["input"]
    n = [0]

    def nm(t):
        n[0] += 1
        return f"{t}_{n[0]}"

    x = "input"
    for s, w in zip(steps, ws):
        if s["op"] == "conv":
            out = nm("conv")
            wn = out + "_w"
            inits.append(W.tensor(wn, w["w"]))
            ins = [x, wn]
            if w["b"] is not None:
                bn_ = out + "_b"
                inits.append(W.tensor(bn_, w["b"]))
                ins.append(bn_)
            attrs = dict(strides=[s["stride"]] * 2, pads=[s["pad"]] * 4,
                         kernel_shape=[s["k"]] * 2)
            if s["groups"] != 1:
                attrs["group"] = s["groups"]
            nodes.append(W.node("Conv", ins, [out], **attrs))
        elif s["op"] == "bn":
            out = nm("bn")
            wns = []
            for suf, key in (("_g", "scale"), ("_b", "bias"),
                             ("_m", "mean"), ("_v", "var")):
                inits.append(W.tensor(out + suf, w[key]))
                wns.append(out + suf)
            nodes.append(W.node("BatchNormalization", [x] + wns, [out],
                                epsilon=1e-5))
        elif s["op"] == "prelu":
            out = nm("prelu")
            inits.append(W.tensor(out + "_s", w["alpha"].reshape(-1, 1, 1)))
            nodes.append(W.node("PRelu", [x, out + "_s"], [out]))
        elif s["op"] == "relu":
            out = nm("relu")
            nodes.append(W.node("Relu", [x], [out]))
        elif s["op"] == "leakyrelu":
            out = nm("lrelu")
            nodes.append(W.node("LeakyRelu", [x], [out], alpha=0.1))
        elif s["op"] == "sigmoid":
            out = nm("sig")
            nodes.append(W.node("Sigmoid", [x], [out]))
        elif s["op"] == "mul":
            out = nm("mul")
            inits.append(W.tensor(out + "_c", np.float32(s["v"]).reshape(())))
            nodes.append(W.node("Mul", [x, out + "_c"], [out]))
        elif s["op"] == "clip":
            out = nm("clip")
            nodes.append(W.node("Clip", [x], [out], min=s["lo"], max=s["hi"]))
        elif s["op"] == "maxpool":
            out = nm("mp")
            nodes.append(W.node("MaxPool", [x], [out], kernel_shape=[2, 2],
                                strides=[2, 2]))
        elif s["op"] == "avgpool":
            out = nm("ap")
            nodes.append(W.node("AveragePool", [x], [out], kernel_shape=[2, 2],
                                strides=[2, 2]))
        elif s["op"] == "s2d":
            out = nm("s2d")
            nodes.append(W.node("SpaceToDepth", [x], [out], blocksize=2))
        elif s["op"] == "upsample":
            out = nm("up")
            nodes.append(W.node("Upsample", [x], [out], mode=b"nearest",
                                scales=[1.0, 1.0, 2.0, 2.0]))
        elif s["op"] == "add":
            out = nm("add")
            nodes.append(W.node("Add", [x, names[s["src"]]], [out]))
        elif s["op"] == "head":
            flat = nm("flatten")
            nodes.append(W.node("Flatten", [x], [flat], axis=1))
            out = nm("gemm")
            gw = w["w"] if s["trans_b"] else w["w"].T.copy()
            inits.append(W.tensor(out + "_w", gw))
            ins = [flat, out + "_w"]
            if w["b"] is not None:
                inits.append(W.tensor(out + "_b", w["b"]))
                ins.append(out + "_b")
            nodes.append(W.node("Gemm", ins, [out],
                                transB=int(s["trans_b"])))
        x = out
        names.append(out)
    g = W.graph(nodes, inits, [("input", [1, IN_CH, IN_SIZE, IN_SIZE])],
                [(x, [None, None])])
    return W.model(g)


# ------------------------------------------------------------ torch oracle

def _torch_forward(steps, ws, x_nchw):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_nchw)
    outs = [x]
    for s, w in zip(steps, ws):
        if s["op"] == "conv":
            b = None if w["b"] is None else torch.from_numpy(w["b"])
            x = F.conv2d(x, torch.from_numpy(w["w"]), b,
                         stride=s["stride"], padding=s["pad"],
                         groups=s["groups"])
        elif s["op"] == "bn":
            x = F.batch_norm(
                x, torch.from_numpy(w["mean"]), torch.from_numpy(w["var"]),
                torch.from_numpy(w["scale"]), torch.from_numpy(w["bias"]),
                training=False, eps=1e-5,
            )
        elif s["op"] == "prelu":
            x = F.prelu(x, torch.from_numpy(w["alpha"]))
        elif s["op"] == "relu":
            x = F.relu(x)
        elif s["op"] == "leakyrelu":
            x = F.leaky_relu(x, 0.1)
        elif s["op"] == "sigmoid":
            x = torch.sigmoid(x)
        elif s["op"] == "mul":
            x = x * s["v"]
        elif s["op"] == "clip":
            x = torch.clamp(x, s["lo"], s["hi"])
        elif s["op"] == "maxpool":
            x = F.max_pool2d(x, 2, 2)
        elif s["op"] == "avgpool":
            x = F.avg_pool2d(x, 2, 2)
        elif s["op"] == "s2d":
            n_, c, h, wdt = x.shape
            x = x.reshape(n_, c, h // 2, 2, wdt // 2, 2)
            x = x.permute(0, 3, 5, 1, 2, 4).reshape(n_, c * 4, h // 2, wdt // 2)
        elif s["op"] == "upsample":
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        elif s["op"] == "add":
            x = x + outs[s["src"]]
        elif s["op"] == "head":
            x = torch.flatten(x, 1)
            x = x @ torch.from_numpy(w["w"]).T
            if w["b"] is not None:
                x = x + torch.from_numpy(w["b"])
        outs.append(x)
    return x.numpy()


def _run_spec(steps, ws, x, nhwc):
    blob = _emit(steps, ws)
    graph = proto.parse_model(blob)
    ex = Executor(graph, nhwc=nhwc)
    return np.asarray(ex.run({"input": x})[0])


def _shrink(steps, ws, x, nhwc):
    """Minimal failing prefix (head re-attached so the graph stays valid)."""
    for n in range(1, len(steps)):
        prefix, wpre = steps[:n], ws[:n]
        # recompute head input dims by replaying the shape math
        c, h = IN_CH, IN_SIZE
        for s in prefix:
            if s["op"] == "conv":
                c, h = s["cout"], (h + 2 * s["pad"] - s["k"]) // s["stride"] + 1
            elif s["op"] in ("maxpool", "avgpool"):
                h //= 2
            elif s["op"] == "s2d":
                c, h = c * 4, h // 2
            elif s["op"] == "upsample":
                h *= 2
        rng = np.random.default_rng(0)
        head = {"op": "head", "cin": c, "h": h, "out": 8,
                "trans_b": True, "bias": False}
        hw = _gen_weights(rng, [head])[0]
        trial_s, trial_w = prefix + [head], wpre + [hw]
        got = _run_spec(trial_s, trial_w, x, nhwc)
        want = _torch_forward(trial_s, trial_w, x)
        if not np.allclose(got, want, atol=1e-4, rtol=1e-3):
            return trial_s
    return steps


@pytest.mark.parametrize("nhwc", [False, True], ids=["nchw", "nhwc-fast"])
def test_fuzz_wire_roundtrip_vs_torch(nhwc):
    failures = []
    for seed in range(N_GRAPHS):
        rng = np.random.default_rng(1000 + seed)
        steps = _gen_spec(rng)
        ws = _gen_weights(rng, steps)
        x = rng.normal(0, 1, (1, IN_CH, IN_SIZE, IN_SIZE)).astype(np.float32)
        got = _run_spec(steps, ws, x, nhwc)
        want = _torch_forward(steps, ws, x)
        if got.shape != want.shape or not np.allclose(
            got, want, atol=1e-4, rtol=1e-3
        ):
            minimal = _shrink(steps, ws, x, nhwc)
            failures.append((seed, [s["op"] for s in minimal]))
    assert not failures, f"mismatching graphs (seed, minimal op list): {failures}"
