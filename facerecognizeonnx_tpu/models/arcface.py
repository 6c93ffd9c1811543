"""ArcFace IResNet embedding network (w600k_r50 architecture) in JAX.

The reference runs this model as an opaque ONNX graph
(`w600k_r50.onnx`, 112x112x3 → 512-d, reference: models/README.md:15-19,
src/face_recognizer.cpp:270-283). Here the same IResNet-50 topology is a
pure function over a params pytree so it can be jit/vmap/pjit'd, run in
bf16 on the MXU, and have its weights imported from the ONNX file
(onnx_import/) or initialized deterministically.

Topology (InsightFace IResNet family):
  stem:   conv3x3(3→64, s1) → BN → PReLU
  stages: [3, 4, 14, 3] IBasicBlocks at widths [64, 128, 256, 512],
          first block of each stage strides 2 (112→56→28→14→7)
  block:  BN → conv3x3 s1 → BN → PReLU → conv3x3 s_block → BN, plus
          conv1x1+BN shortcut when shape changes
  head:   BN → flatten(512*7*7) → dropout → FC(512) → BN1d

Output is NOT L2-normalized here; normalization happens in the embed
pipeline, matching the reference's post-Run normalize
(src/face_recognizer.cpp:297).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.models import layers as L

# (stage_blocks, widths) — iresnet50; iresnet18/34/100 also provided for
# the wider model-family surface.
IRESNET_SPECS = {
    "iresnet18": ((2, 2, 2, 2), (64, 128, 256, 512)),
    "iresnet34": ((3, 4, 6, 3), (64, 128, 256, 512)),
    "iresnet50": ((3, 4, 14, 3), (64, 128, 256, 512)),
    "iresnet100": ((3, 13, 30, 3), (64, 128, 256, 512)),
}


def init_params(
    key,
    arch: str = "iresnet50",
    input_size: int = 112,
    feature_dim: int = 512,
) -> Dict:
    blocks, widths = IRESNET_SPECS[arch]
    keys = iter(jax.random.split(key, 4 + 2 * sum(blocks) + 2 + 8))

    params: Dict = {
        "conv1": L.conv_init(next(keys), 3, 3, 3, 64),
        "bn1": L.bn_init(64),
        "prelu1": L.prelu_init(64),
    }

    inplanes = 64
    for s, (n, planes) in enumerate(zip(blocks, widths), start=1):
        stage = []
        for b in range(n):
            stride = 2 if b == 0 else 1
            block = {
                "bn1": L.bn_init(inplanes),
                "conv1": L.conv_init(next(keys), 3, 3, inplanes, planes),
                "bn2": L.bn_init(planes),
                "prelu": L.prelu_init(planes),
                "conv2": L.conv_init(next(keys), 3, 3, planes, planes),
                "bn3": L.bn_init(planes),
            }
            if stride != 1 or inplanes != planes:
                block["down_conv"] = L.conv_init(next(keys), 1, 1, inplanes, planes)
                block["down_bn"] = L.bn_init(planes)
            stage.append(block)
            inplanes = planes
        params[f"layer{s}"] = stage

    spatial = input_size // 16  # four stride-2 stages
    params["bn2"] = L.bn_init(widths[-1])
    params["fc"] = L.linear_init(next(keys), widths[-1] * spatial * spatial, feature_dim)
    params["features_bn"] = L.bn_init(feature_dim)
    return params


def _block_apply(p, x, stride, compute_dtype, train, stats_out, conv_fn):
    # Post-conv BNs (bn2/bn3/down_bn) may be folded into the conv weights
    # by fold_inference_params(); bn1 is PRE-conv and always present.
    out, s = L.batch_norm(p["bn1"], x, train)
    _collect(stats_out, "bn1", s)
    out = conv_fn(p["conv1"], out, 1, 1, compute_dtype=compute_dtype)
    if "bn2" in p:
        out, s = L.batch_norm(p["bn2"], out, train)
        _collect(stats_out, "bn2", s)
    out = L.prelu(p["prelu"], out)
    out = conv_fn(p["conv2"], out, stride, 1, compute_dtype=compute_dtype)
    if "bn3" in p:
        out, s = L.batch_norm(p["bn3"], out, train)
        _collect(stats_out, "bn3", s)
    if "down_conv" in p:
        identity = conv_fn(p["down_conv"], x, stride, 0, compute_dtype=compute_dtype)
        if "down_bn" in p:
            identity, s = L.batch_norm(p["down_bn"], identity, train)
            _collect(stats_out, "down_bn", s)
    else:
        identity = x
    return out + identity


def _collect(stats_out, name, stats):
    if stats_out is not None and stats is not None:
        stats_out[name] = stats


def apply(
    params: Dict,
    x: jnp.ndarray,
    compute_dtype=jnp.float32,
    train: bool = False,
    conv_fn=None,
    linear_fn=None,
) -> jnp.ndarray | Tuple[jnp.ndarray, Dict]:
    """Forward pass. x: (B, S, S, 3) normalized [-1, 1] RGB, NHWC.

    Returns (B, 512) float32 features; with train=True also returns the
    dict of per-BN batch stats for running-average updates.

    conv_fn/linear_fn override the conv/FC ops (same signatures as
    layers.conv2d/linear). models/quant.py uses these hooks to run the
    SAME topology with int8 convs and to record calibration scales —
    the architecture is defined once, here.
    """
    conv_fn = conv_fn or L.conv2d
    linear_fn = linear_fn or L.linear
    x = x.astype(compute_dtype)
    all_stats: Dict = {} if train else None

    def bn(name_path, p, v):
        y, s = L.batch_norm(p, v, train)
        _collect(all_stats, name_path, s)
        return y

    out = conv_fn(params["conv1"], x, 1, 1, compute_dtype=compute_dtype)
    if "bn1" in params:  # folded into conv1 by fold_inference_params()
        out = bn("bn1", params["bn1"], out)
    out = L.prelu(params["prelu1"], out)

    for s in (1, 2, 3, 4):
        for b, block in enumerate(params[f"layer{s}"]):
            stride = 2 if b == 0 else 1
            sub = {} if train else None
            out = _block_apply(block, out, stride, compute_dtype, train, sub, conv_fn)
            if train:
                for k, v in sub.items():
                    all_stats[f"layer{s}/{b}/{k}"] = v

    out = bn("bn2", params["bn2"], out)
    # NHWC flatten. ONNX/torch flatten CHW; the importer permutes the FC
    # weight rows accordingly so numerics match (onnx_import/importer.py).
    b_ = out.shape[0]
    out = out.reshape(b_, -1)
    out = linear_fn(params["fc"], out, compute_dtype=compute_dtype)
    if "features_bn" in params:  # folded into fc by fold_inference_params()
        out = bn("features_bn", params["features_bn"], out)
    out = out.astype(jnp.float32)
    return (out, all_stats) if train else out


def fold_inference_params(params: Dict) -> Dict:
    """Inference-only param transform: exactly fold every POST-conv /
    post-FC BatchNorm into the preceding weights (see
    layers.fold_bn_into_conv — exact for any padding). PRE-conv BNs
    (block bn1, the pre-flatten bn2) stay: folding a BN that FEEDS a
    zero-padded conv changes border pixels, so only the exact half is
    folded (docs/PERFORMANCE.md round-2 agenda item 3).

    Removes ~½ of the VPU-side BN work per forward. Folded params are
    NOT trainable — apply(..., train=True) requires unfolded params.
    """
    out: Dict = {
        "conv1": L.fold_bn_into_conv(params["conv1"], params["bn1"]),
        "prelu1": params["prelu1"],
        "bn2": params["bn2"],
        "fc": L.fold_bn_into_linear(params["fc"], params["features_bn"]),
    }
    for s in (1, 2, 3, 4):
        stage = []
        for block in params[f"layer{s}"]:
            nb = {
                "bn1": block["bn1"],
                "conv1": L.fold_bn_into_conv(block["conv1"], block["bn2"]),
                "prelu": block["prelu"],
                "conv2": L.fold_bn_into_conv(block["conv2"], block["bn3"]),
            }
            if "down_conv" in block:
                nb["down_conv"] = L.fold_bn_into_conv(
                    block["down_conv"], block["down_bn"]
                )
            stage.append(nb)
        out[f"layer{s}"] = stage
    return out


# Stat keys: "bn1", "bn2", "features_bn", "layer{s}/{b}/{bn_name}".
update_bn_stats = L.update_bn_stats


def num_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
