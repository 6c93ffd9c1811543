"""Map an exported ArcFace IResNet .onnx onto the native NHWC params.

The graph executor (executor.py) runs any supported ONNX file correctly
but in NCHW with per-node jnp ops; the NATIVE models (models/arcface.py)
are the fast TPU path. Torch exports emit nodes in forward-execution
order, so the IResNet weight sequence is deterministic:

  convs:  stem.conv, then per block conv1, conv2[, down_conv]   + final Gemm
  bns:    stem.bn,  then per block bn1, bn2, bn3[, down_bn], bn2(post), features
  prelus: stem.prelu, then one per block

`map_arcface` walks those per-op-type sequences, checks every shape
against the native skeleton, applies the layout transforms
(OIHW→HWIO; Gemm rows re-permuted from CHW-flatten to HWC-flatten), and
then SELF-VERIFIES: native forward vs graph-executor forward on a random
input must agree to 1e-3 cosine, else the mapping is rejected and the
caller stays on the executor path. No silent wrong-weights mode exists.

(SCRFD's det_500m backbone is a NAS topology that doesn't correspond to
the native scrfd module — detector .onnx files always run through the
graph executor.)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from facerecognizeonnx_tpu.models import arcface
from facerecognizeonnx_tpu.onnx_import import proto
from facerecognizeonnx_tpu.onnx_import.executor import Executor


def _conv_weight(onnx_w: np.ndarray) -> np.ndarray:
    return np.transpose(onnx_w, (2, 3, 1, 0))  # OIHW → HWIO


def _gemm_weight(onnx_w: np.ndarray, trans_b: bool, spatial: int, cin: int) -> np.ndarray:
    """(out, in_chw) [or transposed] → (in_hwc, out) with row re-permute."""
    w = onnx_w if trans_b else onnx_w.T  # → (out, in)
    out_dim = w.shape[0]
    w = w.reshape(out_dim, cin, spatial, spatial)  # (out, C, H, W)
    w = np.transpose(w, (0, 2, 3, 1))  # (out, H, W, C)
    return w.reshape(out_dim, -1).T.copy()  # (in_hwc, out)


def _collect(graph: proto.Graph):
    init = graph.initializers
    seq = {"Conv": [], "BatchNormalization": [], "PRelu": [], "Gemm": [], "MatMul": []}
    for node in graph.nodes:
        if node.op_type in seq:
            seq[node.op_type].append(
                {"node": node, "weights": [init.get(i) for i in node.inputs[1:]]}
            )
    return seq


def map_arcface(
    path_or_graph,
    arch: str = "iresnet50",
    input_size: int = 112,
    verify: bool = True,
) -> Optional[Dict]:
    """Returns native params, or None if the graph doesn't match `arch`
    (wrong depth, shape mismatch, or failed numeric self-check)."""
    graph = (
        proto.load_model(path_or_graph)
        if isinstance(path_or_graph, str)
        else path_or_graph
    )
    seq = _collect(graph)
    convs: List[dict] = seq["Conv"]
    bns: List[dict] = seq["BatchNormalization"]
    prelus: List[dict] = seq["PRelu"]
    gemms: List[dict] = seq["Gemm"] + seq["MatMul"]

    blocks, widths = arcface.IRESNET_SPECS[arch]
    skeleton = arcface.init_params(jax.random.PRNGKey(0), arch=arch, input_size=input_size)

    ci = iter(convs)
    bi = iter(bns)
    pi = iter(prelus)

    def take_conv(dst, kh, cin, cout):
        try:
            item = next(ci)
        except StopIteration:
            raise _Mismatch("ran out of Conv nodes")
        w = item["weights"][0]
        if w is None or w.shape != (cout, cin, kh, kh):
            raise _Mismatch(f"conv shape {None if w is None else w.shape} != {(cout, cin, kh, kh)}")
        dst["w"] = _conv_weight(w.astype(np.float32))
        if len(item["weights"]) > 1 and item["weights"][1] is not None:
            dst["b"] = item["weights"][1].astype(np.float32)

    def take_bn(dst, c):
        try:
            item = next(bi)
        except StopIteration:
            raise _Mismatch("ran out of BN nodes")
        ws = item["weights"]
        if len(ws) < 4 or any(w is None or w.shape != (c,) for w in ws[:4]):
            raise _Mismatch(f"bn channels != {c}")
        dst["scale"], dst["bias"], dst["mean"], dst["var"] = (
            w.astype(np.float32) for w in ws[:4]
        )

    def take_prelu(dst, c):
        try:
            item = next(pi)
        except StopIteration:
            raise _Mismatch("ran out of PRelu nodes")
        w = item["weights"][0]
        if w is None or w.size != c:
            raise _Mismatch(f"prelu channels != {c}")
        dst["alpha"] = w.reshape(-1).astype(np.float32)

    try:
        take_conv(skeleton["conv1"], 3, 3, 64)
        take_bn(skeleton["bn1"], 64)
        take_prelu(skeleton["prelu1"], 64)
        inplanes = 64
        for s, (n, planes) in enumerate(zip(blocks, widths), start=1):
            for b in range(n):
                blk = skeleton[f"layer{s}"][b]
                take_bn(blk["bn1"], inplanes)
                take_conv(blk["conv1"], 3, inplanes, planes)
                take_bn(blk["bn2"], planes)
                take_prelu(blk["prelu"], planes)
                take_conv(blk["conv2"], 3, planes, planes)
                take_bn(blk["bn3"], planes)
                if "down_conv" in blk:
                    take_conv(blk["down_conv"], 1, inplanes, planes)
                    take_bn(blk["down_bn"], planes)
                inplanes = planes
        take_bn(skeleton["bn2"], widths[-1])
        if not gemms:
            raise _Mismatch("no Gemm/MatMul head")
        gemm = gemms[0]
        w = gemm["weights"][0]
        if w is None:
            raise _Mismatch("Gemm weight not an initializer")
        spatial = input_size // 16
        trans_b = bool(gemm["node"].attrs.get("transB", 0))
        feat_dim = skeleton["fc"]["w"].shape[1]
        expect_in = widths[-1] * spatial * spatial
        wt = w if trans_b else w.T
        if wt.shape != (feat_dim, expect_in):
            raise _Mismatch(f"fc shape {w.shape} unexpected")
        skeleton["fc"]["w"] = _gemm_weight(
            w.astype(np.float32), trans_b, spatial, widths[-1]
        )
        if len(gemm["weights"]) > 1 and gemm["weights"][1] is not None:
            skeleton["fc"]["b"] = gemm["weights"][1].astype(np.float32)
        take_bn(skeleton["features_bn"], feat_dim)
        # all sequences must be exhausted — extra nodes mean a different arch
        for it, tag_ in ((ci, "Conv"), (bi, "BN"), (pi, "PRelu")):
            if next(it, None) is not None:
                raise _Mismatch(f"extra {tag_} nodes")
    except _Mismatch:
        return None

    if verify:
        try:
            rng = np.random.default_rng(0)
            x = rng.uniform(-1, 1, (1, input_size, input_size, 3)).astype(
                np.float32
            )
            native = np.asarray(arcface.apply(skeleton, x))
            ex = Executor(graph)
            ref = np.asarray(
                ex.run({ex.input_names[0]: np.transpose(x, (0, 3, 1, 2))})[0]
            ).reshape(1, -1)
            cos = float(
                (native * ref).sum()
                / max(np.linalg.norm(native) * np.linalg.norm(ref), 1e-12)
            )
        except Exception:
            return None  # graph we can't even execute → never trust a mapping
        if not np.isfinite(cos) or cos < 1 - 1e-3:
            return None
    return skeleton


def map_mobilefacenet(
    path_or_graph,
    arch: str = "mbf",
    input_size: int = 112,
    verify: bool = True,
) -> Optional[Dict]:
    """Map a w600k_mbf-shaped export onto the native MobileFaceNet params
    (models/mobilefacenet.py). Same contract as map_arcface: walk the
    forward-order Conv/BN/PRelu sequences against the native skeleton,
    OIHW→HWIO each conv, then numerically self-verify vs the graph
    executor — None on any mismatch (caller falls back to the executor)."""
    from facerecognizeonnx_tpu.models import mobilefacenet as mbf

    graph = (
        proto.load_model(path_or_graph)
        if isinstance(path_or_graph, str)
        else path_or_graph
    )
    seq = _collect(graph)
    blocks, scale = mbf.MBF_SPECS[arch]
    plan = mbf._body_plan(blocks, scale)
    skeleton = mbf.init_params(jax.random.PRNGKey(0), arch=arch, input_size=input_size)

    ci, bi, pi = iter(seq["Conv"]), iter(seq["BatchNormalization"]), iter(seq["PRelu"])
    gemms = seq["Gemm"] + seq["MatMul"]

    def take_conv(dst, kh, cin, cout, groups=1):
        item = next(ci, None)
        if item is None:
            raise _Mismatch("ran out of Conv nodes")
        w = item["weights"][0]
        want = (cout, cin // groups, kh, kh)
        if w is None or w.shape != want:
            raise _Mismatch(f"conv shape {None if w is None else w.shape} != {want}")
        if int(item["node"].attrs.get("group", 1)) != groups:
            raise _Mismatch("conv group attribute mismatch")
        dst["w"] = _conv_weight(w.astype(np.float32))
        if len(item["weights"]) > 1 and item["weights"][1] is not None:
            dst["b"] = item["weights"][1].astype(np.float32)

    def take_bn(dst, c):
        item = next(bi, None)
        if item is None:
            raise _Mismatch("ran out of BN nodes")
        ws = item["weights"]
        if len(ws) < 4 or any(w is None or w.shape != (c,) for w in ws[:4]):
            raise _Mismatch(f"bn channels != {c}")
        dst["scale"], dst["bias"], dst["mean"], dst["var"] = (
            w.astype(np.float32) for w in ws[:4]
        )

    def take_prelu(dst, c):
        item = next(pi, None)
        if item is None:
            raise _Mismatch("ran out of PRelu nodes")
        w = item["weights"][0]
        if w is None or w.size != c:
            raise _Mismatch(f"prelu channels != {c}")
        dst["alpha"] = w.reshape(-1).astype(np.float32)

    c64 = 64 * scale
    spatial = input_size // 16
    try:
        take_conv(skeleton["stem"]["conv"], 3, 3, c64)
        take_bn(skeleton["stem"]["bn"], c64)
        take_prelu(skeleton["stem"]["prelu"], c64)
        take_conv(skeleton["stem_dw"]["conv"], 3, c64, c64, groups=64)
        take_bn(skeleton["stem_dw"]["bn"], c64)
        take_prelu(skeleton["stem_dw"]["prelu"], c64)
        for (cin, cout, g, _stride), blk in zip(plan, skeleton["body"]):
            take_conv(blk["pw1"], 1, cin, g)
            take_bn(blk["pw1_bn"], g)
            take_prelu(blk["pw1_prelu"], g)
            take_conv(blk["dw"], 3, g, g, groups=g)
            take_bn(blk["dw_bn"], g)
            take_prelu(blk["dw_prelu"], g)
            take_conv(blk["pw2"], 1, g, cout)
            take_bn(blk["pw2_bn"], cout)
        take_conv(skeleton["conv_sep"]["conv"], 1, 2 * c64, 512)
        take_bn(skeleton["conv_sep"]["bn"], 512)
        take_prelu(skeleton["conv_sep"]["prelu"], 512)
        take_conv(skeleton["gdc_dw"]["conv"], spatial, 512, 512, groups=512)
        take_bn(skeleton["gdc_dw"]["bn"], 512)
        if not gemms:
            raise _Mismatch("no Gemm/MatMul head")
        gemm = gemms[0]
        w = gemm["weights"][0]
        if w is None:
            raise _Mismatch("Gemm weight not an initializer")
        trans_b = bool(gemm["node"].attrs.get("transB", 0))
        feat_dim = skeleton["fc"]["w"].shape[1]
        wt = w if trans_b else w.T  # → (out, 512); GDC output is 1x1 so
        if wt.shape != (feat_dim, 512):  # CHW==C order, plain transpose
            raise _Mismatch(f"fc shape {w.shape} unexpected")
        skeleton["fc"] = {"w": wt.T.astype(np.float32).copy()}
        if len(gemm["weights"]) > 1 and gemm["weights"][1] is not None:
            skeleton["fc"]["b"] = gemm["weights"][1].astype(np.float32)
        take_bn(skeleton["features_bn"], feat_dim)
        for it, tag_ in ((ci, "Conv"), (bi, "BN"), (pi, "PRelu")):
            if next(it, None) is not None:
                raise _Mismatch(f"extra {tag_} nodes")
    except _Mismatch:
        return None

    if verify:
        try:
            rng = np.random.default_rng(0)
            x = rng.uniform(-1, 1, (1, input_size, input_size, 3)).astype(
                np.float32
            )
            native = np.asarray(mbf.apply(skeleton, x))
            ex = Executor(graph)
            ref = np.asarray(
                ex.run({ex.input_names[0]: np.transpose(x, (0, 3, 1, 2))})[0]
            ).reshape(1, -1)
            cos = float(
                (native * ref).sum()
                / max(np.linalg.norm(native) * np.linalg.norm(ref), 1e-12)
            )
        except Exception:
            return None
        if not np.isfinite(cos) or cos < 1 - 1e-3:
            return None
    return skeleton


def map_recognizer(path: str, arch: str, input_size: int = 112) -> Optional[Dict]:
    """Arch-directed native mapping: try the mapper matching `arch`
    first, then the other two families (iresnet / mobilefacenet / vit —
    all three self-verify against the graph executor, so a wrong guess
    can only cost failed walks, never wrong weights)."""
    if arch.startswith("mbf"):
        attempts = [(map_mobilefacenet, arch), (map_arcface, "iresnet50"),
                    (map_vit, "vit_t")]
    elif arch.startswith("vit"):
        attempts = [(map_vit, arch), (map_arcface, "iresnet50"),
                    (map_mobilefacenet, "mbf")]
    else:
        attempts = [(map_arcface, arch), (map_mobilefacenet, "mbf"),
                    (map_vit, "vit_t")]
    for fn, a in attempts:
        mapped = fn(path, arch=a, input_size=input_size)
        if mapped is not None:
            return mapped
    return None


class _Mismatch(Exception):
    pass


def map_vit(
    path_or_graph,
    arch: str = "vit_t",
    input_size: int = 112,
    verify: bool = True,
) -> Optional[Dict]:
    """Map a ViT recognizer .onnx (the decomposed-LN opset-9 shape
    onnx_export/emit.emit_vit_onnx writes) onto native models/vit.py
    params. `arch` is advisory — the width is inferred from the patch
    Conv and must name a VIT_SPECS member. Same contract as the other
    mappers: walks deterministic node order with shape checks,
    self-verifies against the graph executor, returns None on any
    mismatch (never wrong weights).

    Weight identification is structural, not name-based: LayerNorm
    scales are the Mul operands shaped (D,) (attention/GELU scalings
    are 0-d), each LN bias is the Add consuming that Mul's output, and
    each MatMul's bias is the Add consuming the MatMul's output.
    """
    from facerecognizeonnx_tpu.models import vit as vit_mod

    graph = (
        proto.load_model(path_or_graph)
        if isinstance(path_or_graph, str)
        else path_or_graph
    )
    init = graph.initializers
    try:
        convs = [n for n in graph.nodes if n.op_type == "Conv"]
        gemms = [n for n in graph.nodes if n.op_type == "Gemm"]
        bns = [n for n in graph.nodes if n.op_type == "BatchNormalization"]
        if len(convs) != 1 or len(gemms) != 1 or len(bns) != 1:
            return None
        wc = init.get(convs[0].inputs[1])
        if wc is None or wc.ndim != 4 or wc.shape[1] != 3:
            return None
        d = wc.shape[0]
        patch = wc.shape[2]
        if patch != vit_mod.PATCH or d not in vit_mod.VIT_SPECS_BY_DIM:
            return None
        _dim, depth, _heads = vit_mod.VIT_SPECS_BY_DIM[d]

        # consumer map: tensor name → nodes reading it
        consumers: Dict[str, List[proto.Node]] = {}
        for n in graph.nodes:
            for i in n.inputs:
                consumers.setdefault(i, []).append(n)

        def bias_of(node):
            """The (single-init) Add consuming `node`'s output."""
            for c in consumers.get(node.outputs[0], []):
                if c.op_type == "Add":
                    for i in c.inputs:
                        if i in init:
                            return np.asarray(init[i], np.float32)
            return None

        # patch conv: OIHW (D, 3, P, P) → (py*px*c flat, D)
        pdim = patch * patch * 3
        w_patch = np.transpose(np.asarray(wc, np.float32), (2, 3, 1, 0)
                               ).reshape(pdim, d)
        b_patch = (np.asarray(init[convs[0].inputs[2]], np.float32)
                   if len(convs[0].inputs) > 2 else np.zeros(d, np.float32))

        # pos embed: the Add with a rank-2 (T, D) initializer
        pos = None
        for n in graph.nodes:
            if n.op_type != "Add":
                continue
            for i in n.inputs:
                a = init.get(i)
                if a is not None and a.ndim == 2 and a.shape[1] == d:
                    pos = np.asarray(a, np.float32)
        if pos is None:
            return None

        # MatMuls in forward order: depth x [qkv, proj, mlp1, mlp2]
        mms = [n for n in graph.nodes if n.op_type == "MatMul"]
        # attention MatMuls have NO initializer operand — drop them
        mms = [n for n in mms if any(i in init for i in n.inputs)]
        if len(mms) != 4 * depth:
            return None

        def mm_weights(node, din, dout):
            w = next(np.asarray(init[i], np.float32)
                     for i in node.inputs if i in init)
            if w.shape != (din, dout):
                raise _Mismatch(f"{w.shape} != {(din, dout)}")
            b = bias_of(node)
            if b is None or b.shape != (dout,):
                raise _Mismatch("missing bias")
            return {"w": w, "b": b}

        # LayerNorm scales: Mul with a (D,) initializer operand, in
        # order [block0 ln1, block0 ln2, ..., ln_f]
        ln_muls = []
        for n in graph.nodes:
            if n.op_type != "Mul":
                continue
            for i in n.inputs:
                a = init.get(i)
                if a is not None and a.shape == (d,):
                    ln_muls.append((n, np.asarray(a, np.float32)))
        if len(ln_muls) != 2 * depth + 1:
            return None

        def ln_params(idx):
            node, scale = ln_muls[idx]
            bias = bias_of(node)
            if bias is None or bias.shape != (d,):
                raise _Mismatch("ln bias")
            return {"scale": scale, "bias": bias}

        blocks = []
        for bi in range(depth):
            blocks.append({
                "ln1": ln_params(2 * bi),
                "qkv": mm_weights(mms[4 * bi], d, 3 * d),
                "proj": mm_weights(mms[4 * bi + 1], d, d),
                "ln2": ln_params(2 * bi + 1),
                "mlp1": mm_weights(mms[4 * bi + 2], d, 4 * d),
                "mlp2": mm_weights(mms[4 * bi + 3], 4 * d, d),
            })

        # head: Gemm transB → (out, D); features BN
        gw = np.asarray(init[gemms[0].inputs[1]], np.float32)
        trans_b = bool(gemms[0].attrs.get("transB", 0))
        gw = gw if not trans_b else gw.T  # → (D, out)
        if gw.shape[0] != d:
            return None
        gb = np.asarray(init[gemms[0].inputs[2]], np.float32)
        bn_node = bns[0]
        fbn = {
            "scale": np.asarray(init[bn_node.inputs[1]], np.float32),
            "bias": np.asarray(init[bn_node.inputs[2]], np.float32),
            "mean": np.asarray(init[bn_node.inputs[3]], np.float32),
            "var": np.asarray(init[bn_node.inputs[4]], np.float32),
        }
        t = (input_size // patch) ** 2
        if pos.shape != (t, d):
            return None
        params = {
            "patch": {"w": w_patch, "b": b_patch},
            "pos_embed": pos,
            "blocks": blocks,
            "ln_f": ln_params(2 * depth),
            "fc": {"w": gw, "b": gb},
            "features_bn": fbn,
        }
    except (_Mismatch, KeyError, StopIteration, IndexError):
        return None

    if verify:
        try:
            rng = np.random.default_rng(0)
            x = rng.uniform(-1, 1, (1, input_size, input_size, 3)).astype(
                np.float32
            )
            native = np.asarray(vit_mod.apply(params, x))
            ex = Executor(graph)
            ref = np.asarray(
                ex.run({ex.input_names[0]: np.transpose(x, (0, 3, 1, 2))})[0]
            ).reshape(1, -1)
            cos = float(
                (native * ref).sum()
                / max(np.linalg.norm(native) * np.linalg.norm(ref), 1e-12)
            )
        except Exception:
            return None
        if not np.isfinite(cos) or cos < 1 - 1e-3:
            return None
    return params
