"""SCRFD anchor-free face detector (det_500m class) in JAX.

The reference drives `det_500m.onnx` as an opaque graph and then skips
the real SCRFD decode entirely (reference: src/face_detector.cpp:204-207
reads only output[0] and assumes pre-decoded rows — SURVEY.md §2 quirk).
This module implements the actual model contract the ONNX file has:

  input  (B, 640, 640, 3) normalized RGB
  output 3 strides × {scores (B, H*W*2, 1), bbox (B, H*W*2, 4),
                      kps (B, H*W*2, 10)}  — 9 tensors, stride 8/16/32,
  2 anchors per location, distances in stride units

with the full anchor decode living in detect/decode.py.

Architecture: a 500-MFLOP-class depthwise-separable backbone (stage
widths follow the SCRFD-0.5GF family: 16/16/40/72/152/288), a small FPN
neck, and an FCOS-style head SHARED across strides with per-stride
learnable output scales. This is a TPU-first redesign, not a weight-
compatible clone of the NAS'd reference backbone — real det_500m.onnx
weights run through the generic ONNX executor (onnx_import/) instead.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.models import layers as L

STRIDES = (8, 16, 32)
NUM_ANCHORS = 2  # anchors per location (scale 1x and 2x), SCRFD convention

# Model family: FLOP-class variants mirroring the SCRFD family the
# buffalo model zoo ships (det_500m / det_2.5g / det_10g). Each entry:
# backbone plan of (out_ch, stride) depthwise-separable blocks, neck and
# head widths, stacked head convs. Taps are the last stride-1 block at
# strides 8/16/32.
SCRFD_VARIANTS = {
    "500m": {
        "plan": (
            (16, 2), (16, 1), (40, 2), (40, 1), (72, 2), (72, 1),
            (152, 2), (152, 1), (288, 2), (288, 1),
        ),
        "neck": 64,
        "head": 64,
        "stacked": 2,
    },
    "2.5g": {
        "plan": (
            (28, 2), (28, 1), (56, 2), (56, 1), (112, 2), (112, 1), (112, 1),
            (224, 2), (224, 1), (224, 1), (448, 2), (448, 1),
        ),
        "neck": 96,
        "head": 96,
        "stacked": 3,
    },
    "10g": {
        "plan": (
            (56, 2), (56, 1), (88, 2), (88, 1), (176, 2), (176, 1), (176, 1),
            (352, 2), (352, 1), (352, 1), (704, 2), (704, 1),
        ),
        "neck": 128,
        "head": 128,
        "stacked": 4,
    },
    # TPU-first variant: dense 3x3 convs instead of depthwise-separable.
    # Depthwise convs are VPU-bound on TPU (the 500m net runs at ~2% of
    # MXU peak); dense blocks at modest widths land on the MXU and run
    # FASTER in wall-clock despite ~8x the FLOPs (docs/PERFORMANCE.md).
    "tpu": {
        "plan": (
            (32, 2), (32, 1), (64, 2), (64, 1), (96, 2), (96, 1),
            (128, 2), (128, 1), (160, 2), (160, 1),
        ),
        "neck": 64,
        "head": 64,
        "stacked": 2,
        "dense": True,
    },
    # TPU-first 500m-class variant with a stride-4 space-to-depth stem:
    # the input is rearranged (B, S, S, 3) → (B, S/4, S/4, 48) before the
    # first conv, skipping the S/2-resolution stage entirely — the
    # highest-resolution depthwise blocks are pure VPU overhead on TPU
    # (docs/PERFORMANCE.md round-2 agenda item 1). Same stride-8/16/32
    # taps, widths, neck, and head as "500m".
    "500m_s2d": {
        "plan": (
            (40, 4), (40, 1), (72, 2), (72, 1),
            (152, 2), (152, 1), (288, 2), (288, 1),
        ),
        "neck": 64,
        "head": 64,
        "stacked": 2,
        "s2d": 4,
    },
}

# module-level defaults (500m — the reference's det_500m class)
_BACKBONE_PLAN = SCRFD_VARIANTS["500m"]["plan"]
NECK_CH = 64
HEAD_CH = 64
STACKED_CONVS = 2


def _variant_taps(plan):
    """{channel: tap_name} for the last stride-1 block at each level ≥ 8.

    The three largest channel counts correspond to strides 8/16/32."""
    chans = sorted({c for c, _ in plan})[-3:]
    return dict(zip(chans, ("c3", "c4", "c5")))


_TAPS = _variant_taps(_BACKBONE_PLAN)


def _dw_sep_init(key, cin, cout):
    k1, k2 = jax.random.split(key)
    return {
        "dw": L.conv_init(k1, 3, 3, cin, cin, groups=cin),
        "dw_bn": L.bn_init(cin),
        "dw_prelu": L.prelu_init(cin),
        "pw": L.conv_init(k2, 1, 1, cin, cout),
        "pw_bn": L.bn_init(cout),
        "pw_prelu": L.prelu_init(cout),
    }


def _dense_init(key, cin, cout):
    return {
        "conv": L.conv_init(key, 3, 3, cin, cout),
        "bn": L.bn_init(cout),
        "prelu": L.prelu_init(cout),
    }


def init_params(key, input_size: int = 640, variant: str = "500m") -> Dict:
    del input_size  # fully convolutional; size only matters at decode
    spec = SCRFD_VARIANTS[variant]
    plan = spec["plan"]
    neck_ch, head_ch, stacked = spec["neck"], spec["head"], spec["stacked"]
    taps = _variant_taps(plan)
    stem_ch = plan[0][0]
    n_keys = 1 + len(plan) + 6 + 2 * stacked + 3
    keys = iter(jax.random.split(key, n_keys))

    s2d = int(spec.get("s2d", 0))
    stem_cin = 3 * s2d * s2d if s2d else 3
    params: Dict = {
        "stem": {
            "conv": L.conv_init(next(keys), 3, 3, stem_cin, stem_ch),
            "bn": L.bn_init(stem_ch),
            "prelu": L.prelu_init(stem_ch),
        }
    }

    dense = bool(spec.get("dense"))
    blocks = []
    cin = stem_ch
    for cout, _stride in plan[1:]:
        blocks.append(
            _dense_init(next(keys), cin, cout)
            if dense
            else _dw_sep_init(next(keys), cin, cout)
        )
        cin = cout
    params["backbone"] = blocks

    tap_chans = {v: k for k, v in taps.items()}
    # FPN neck: lateral 1x1 per tap + 3x3 smoothing after top-down add
    params["neck"] = {
        "lat_c3": L.conv_init(next(keys), 1, 1, tap_chans["c3"], neck_ch),
        "lat_c4": L.conv_init(next(keys), 1, 1, tap_chans["c4"], neck_ch),
        "lat_c5": L.conv_init(next(keys), 1, 1, tap_chans["c5"], neck_ch),
        "smooth_p3": L.conv_init(next(keys), 3, 3, neck_ch, neck_ch),
        "smooth_p4": L.conv_init(next(keys), 3, 3, neck_ch, neck_ch),
        "smooth_p5": L.conv_init(next(keys), 3, 3, neck_ch, neck_ch),
    }

    # Shared head: stacked 3x3 convs then 3 prediction convs
    head: Dict = {"convs": []}
    cin = neck_ch
    for _ in range(stacked):
        head["convs"].append(
            {
                "conv": L.conv_init(next(keys), 3, 3, cin, head_ch),
                "bn": L.bn_init(head_ch),
                "prelu": L.prelu_init(head_ch),
            }
        )
        cin = head_ch
    head["cls"] = L.conv_init(next(keys), 3, 3, head_ch, NUM_ANCHORS * 1)
    head["bbox"] = L.conv_init(next(keys), 3, 3, head_ch, NUM_ANCHORS * 4)
    head["kps"] = L.conv_init(next(keys), 3, 3, head_ch, NUM_ANCHORS * 10)
    # bias the cls conv towards background (focal-style init)
    head["cls"]["b"] = jnp.full((NUM_ANCHORS,), -4.59, jnp.float32)  # σ≈0.01
    head["bbox"]["b"] = jnp.zeros((NUM_ANCHORS * 4,), jnp.float32)
    head["kps"]["b"] = jnp.zeros((NUM_ANCHORS * 10,), jnp.float32)
    params["head"] = head

    # per-stride learnable scales for the distance regressions
    params["scales"] = {f"s{s}": jnp.ones((), jnp.float32) for s in STRIDES}
    return params


def infer_variant(params: Dict) -> str:
    """Recover the variant from params structure (block count + widths +
    block type), so apply() needs no side-channel metadata in the pytree."""
    backbone = params["backbone"]
    is_dense = "conv" in backbone[0]
    for name, spec in SCRFD_VARIANTS.items():
        if bool(spec.get("dense")) != is_dense:
            continue
        plan = spec["plan"][1:]
        if len(plan) != len(backbone):
            continue
        key = "conv" if is_dense else "pw"
        if all(
            blk[key]["w"].shape[-1] == cout
            for (cout, _), blk in zip(plan, backbone)
        ):
            return name
    raise ValueError("params do not match any known SCRFD variant")


def _dw_sep_apply(p, x, stride, compute_dtype, train, stats, path):
    # Every BN here is POST-conv; fold_inference_params() may have folded
    # them into the conv weights (key absent → already folded).
    if "conv" in p:  # dense (TPU) block
        y = L.conv2d(p["conv"], x, stride, 1, compute_dtype=compute_dtype)
        if "bn" in p:
            y, s = L.batch_norm(p["bn"], y, train)
            if train:
                stats[f"{path}/bn"] = s
        return L.prelu(p["prelu"], y)
    cin = x.shape[-1]
    y = L.conv2d(p["dw"], x, stride, 1, groups=cin, compute_dtype=compute_dtype)
    if "dw_bn" in p:
        y, s = L.batch_norm(p["dw_bn"], y, train)
        if train:
            stats[f"{path}/dw_bn"] = s
    y = L.prelu(p["dw_prelu"], y)
    y = L.conv2d(p["pw"], y, 1, 0, compute_dtype=compute_dtype)
    if "pw_bn" in p:
        y, s = L.batch_norm(p["pw_bn"], y, train)
        if train:
            stats[f"{path}/pw_bn"] = s
    y = L.prelu(p["pw_prelu"], y)
    return y


def apply(
    params: Dict, x: jnp.ndarray, compute_dtype=jnp.float32, train: bool = False
) -> Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Forward. x: (B, S, S, 3) normalized RGB NHWC.

    Returns {stride: (scores, bbox, kps)} with shapes
    (B, H*W*A, 1), (B, H*W*A, 4), (B, H*W*A, 10); scores are POST-sigmoid;
    bbox/kps distances are in stride units (InsightFace SCRFD convention:
    multiply by stride during decode). Anchor index varies fastest, i.e.
    rows are [loc0_a0, loc0_a1, loc1_a0, ...] — matching the interleaved
    anchor-center layout detect/decode.py generates.
    """
    x = x.astype(compute_dtype)
    stats: Dict = {}
    variant = infer_variant(params)
    spec = SCRFD_VARIANTS[variant]
    plan = spec["plan"]
    tap_names = _variant_taps(plan)
    p = params["stem"]
    s2d = int(spec.get("s2d", 0))
    if s2d:
        x = _space_to_depth(x, s2d)
        y = L.conv2d(p["conv"], x, 1, 1, compute_dtype=compute_dtype)
    else:
        y = L.conv2d(p["conv"], x, 2, 1, compute_dtype=compute_dtype)
    if "bn" in p:  # folded by fold_inference_params()
        y, s = L.batch_norm(p["bn"], y, train)
        if train:
            stats["stem/bn"] = s
    y = L.prelu(p["prelu"], y)

    taps = {}
    for i, ((cout, stride), blk) in enumerate(zip(plan[1:], params["backbone"])):
        y = _dw_sep_apply(blk, y, stride, compute_dtype, train, stats, f"backbone/{i}")
        if cout in tap_names and stride == 1:
            taps[tap_names[cout]] = y  # last stride-1 block wins per level

    n = params["neck"]
    p5 = L.conv2d(n["lat_c5"], taps["c5"], 1, 0, compute_dtype=compute_dtype)
    p4 = L.conv2d(n["lat_c4"], taps["c4"], 1, 0, compute_dtype=compute_dtype)
    p3 = L.conv2d(n["lat_c3"], taps["c3"], 1, 0, compute_dtype=compute_dtype)
    p4 = p4 + _upsample2x(p5)
    p3 = p3 + _upsample2x(p4)
    p3 = L.conv2d(n["smooth_p3"], p3, 1, 1, compute_dtype=compute_dtype)
    p4 = L.conv2d(n["smooth_p4"], p4, 1, 1, compute_dtype=compute_dtype)
    p5 = L.conv2d(n["smooth_p5"], p5, 1, 1, compute_dtype=compute_dtype)

    outputs = {}
    for stride, feat in zip(STRIDES, (p3, p4, p5)):
        h = feat
        for ci, cp in enumerate(params["head"]["convs"]):
            h = L.conv2d(cp["conv"], h, 1, 1, compute_dtype=compute_dtype)
            if "bn" in cp:
                h, s = L.batch_norm(cp["bn"], h, train)
                # head weights (and BNs) are shared across strides;
                # calibrate from stride 8, which has the most samples
                if train and stride == STRIDES[0]:
                    stats[f"head/convs/{ci}/bn"] = s
            h = L.prelu(cp["prelu"], h)
        scale = params["scales"][f"s{stride}"]
        cls = L.conv2d(params["head"]["cls"], h, 1, 1, compute_dtype=compute_dtype)
        bbox = L.conv2d(params["head"]["bbox"], h, 1, 1, compute_dtype=compute_dtype)
        kps = L.conv2d(params["head"]["kps"], h, 1, 1, compute_dtype=compute_dtype)
        b, hh, ww, _ = cls.shape
        scores = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(b, hh * ww * NUM_ANCHORS, 1)
        bbox = (bbox.astype(jnp.float32) * scale).reshape(b, hh * ww * NUM_ANCHORS, 4)
        kps = (kps.astype(jnp.float32) * scale).reshape(b, hh * ww * NUM_ANCHORS, 10)
        outputs[stride] = (scores, bbox, kps)
    return (outputs, stats) if train else outputs


def fold_inference_params(params: Dict) -> Dict:
    """Inference-only: fold EVERY BatchNorm into its preceding conv —
    all SCRFD BNs are post-conv, so the whole net folds exactly
    (layers.fold_bn_into_conv). Cuts the VPU-side elementwise work the
    depthwise backbone is bound by (docs/PERFORMANCE.md). Folded params
    are not trainable."""
    out: Dict = {
        "stem": {
            "conv": L.fold_bn_into_conv(params["stem"]["conv"], params["stem"]["bn"]),
            "prelu": params["stem"]["prelu"],
        },
        "neck": params["neck"],
        "scales": params["scales"],
    }
    blocks = []
    for blk in params["backbone"]:
        if "conv" in blk:  # dense block
            blocks.append({
                "conv": L.fold_bn_into_conv(blk["conv"], blk["bn"]),
                "prelu": blk["prelu"],
            })
        else:
            blocks.append({
                "dw": L.fold_bn_into_conv(blk["dw"], blk["dw_bn"]),
                "dw_prelu": blk["dw_prelu"],
                "pw": L.fold_bn_into_conv(blk["pw"], blk["pw_bn"]),
                "pw_prelu": blk["pw_prelu"],
            })
    out["backbone"] = blocks
    head = dict(params["head"])
    head["convs"] = [
        {"conv": L.fold_bn_into_conv(cp["conv"], cp["bn"]), "prelu": cp["prelu"]}
        for cp in params["head"]["convs"]
    ]
    out["head"] = head
    return out


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (FPN top-down path)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/r, W/r, C*r*r): pixel blocks become channels,
    pushing channel count up before the first conv so the early layers
    run at MXU-friendly widths instead of VPU-bound high resolutions."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // r, w // r, c * r * r)


def num_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
