"""MobileFaceNet embedding network (w600k_mbf architecture) in JAX.

The buffalo_sc model pack the reference asks the user to download
(reference: models/README.md:5,23 "这些模型来自 InsightFace 的 buffalo_sc
模型包") ships its recognizer as MobileFaceNet in the smaller packs
(w600k_mbf; the reference's own README names w600k_r50 — both are
members of the same InsightFace w600k family with identical I/O:
112x112x3 → 512-d, L2-normalized downstream exactly like
src/face_recognizer.cpp:297). This module provides the mbf family
member so the framework covers the full buffalo_s/sc/l recognizer
spread next to models/arcface.py's IResNets.

Topology (public InsightFace arcface_torch MobileFaceNet, the
published architecture — this is a spec, not a code port):

  stem:     conv3x3(3→64s, s2) → BN → PReLU           (112 → 56)
  stem_dw:  conv3x3(64s→64s, groups=64, s1) → BN → PReLU
  body:     alternating downsample + residual bottlenecks, each a
            "DepthWise" block: 1x1 expand (→G ch) → BN → PReLU →
            3x3 depthwise (groups=G, stride s) → BN → PReLU →
            1x1 linear (→out) → BN,  residual-added when s=1
            plan for blocks=(1,4,6,2), scale=2 (the "mbf" config):
              G=128 s2 | 4 × G=128 res   (56 → 28)
              G=256 s2 | 6 × G=256 res   (28 → 14)
              G=512 s2 | 2 × G=256 res   (14 → 7)
  conv_sep: conv1x1(128s→512) → BN → PReLU
  GDC head: conv7x7(512→512, groups=512, VALID) → BN →
            FC(512→512, no bias) → BN1d

Every BN is POST-conv, so fold_inference_params() folds the network
into pure convs + PReLUs — at inference mbf runs zero explicit BN ops
(layers.fold_bn_into_conv is exact for any padding).

Output is NOT L2-normalized here; the embed pipeline normalizes,
matching the reference's post-Run normalize (src/face_recognizer.cpp:297).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.models import layers as L

# (blocks, scale) per family member; "mbf" is the w600k_mbf config.
MBF_SPECS = {
    "mbf": ((1, 4, 6, 2), 2),
    "mbf_large": ((2, 8, 12, 4), 4),
}


def _body_plan(blocks: Tuple[int, ...], scale: int) -> List[Tuple[int, int, int, int]]:
    """[(cin, cout, expand_groups, stride)] for the bottleneck body.

    stride-2 entries are downsamplers (no residual); stride-1 entries
    are residual bottlenecks. Mirrors the published layer list: the
    downsampler's expand width G doubles its stage width, residuals use
    the stage's own G.
    """
    c64, c128 = 64 * scale, 128 * scale
    plan = [(c64, c64, 128, 2)]
    plan += [(c64, c64, 128, 1)] * blocks[1]
    plan += [(c64, c128, 256, 2)]
    plan += [(c128, c128, 256, 1)] * blocks[2]
    plan += [(c128, c128, 512, 2)]
    plan += [(c128, c128, 256, 1)] * blocks[3]
    return plan


def init_params(
    key,
    arch: str = "mbf",
    input_size: int = 112,
    feature_dim: int = 512,
) -> Dict:
    blocks, scale = MBF_SPECS[arch]
    assert blocks[0] == 1, "blocks[0]>1 (residual stem) not in the w600k family"
    plan = _body_plan(blocks, scale)
    keys = iter(jax.random.split(key, 8 + 3 * len(plan)))
    c64 = 64 * scale

    params: Dict = {
        "stem": {
            "conv": L.conv_init(next(keys), 3, 3, 3, c64),
            "bn": L.bn_init(c64),
            "prelu": L.prelu_init(c64),
        },
        # grouped (not fully depthwise): 64 groups over 64s channels
        "stem_dw": {
            "conv": L.conv_init(next(keys), 3, 3, c64, c64, groups=64),
            "bn": L.bn_init(c64),
            "prelu": L.prelu_init(c64),
        },
    }

    body = []
    for cin, cout, g, _stride in plan:
        body.append(
            {
                "pw1": L.conv_init(next(keys), 1, 1, cin, g),
                "pw1_bn": L.bn_init(g),
                "pw1_prelu": L.prelu_init(g),
                "dw": L.conv_init(next(keys), 3, 3, g, g, groups=g),
                "dw_bn": L.bn_init(g),
                "dw_prelu": L.prelu_init(g),
                "pw2": L.conv_init(next(keys), 1, 1, g, cout),
                "pw2_bn": L.bn_init(cout),
            }
        )
    params["body"] = body

    c128 = 128 * scale
    spatial = input_size // 16  # stem + three body downsamples
    params["conv_sep"] = {
        "conv": L.conv_init(next(keys), 1, 1, c128, 512),
        "bn": L.bn_init(512),
        "prelu": L.prelu_init(512),
    }
    params["gdc_dw"] = {
        "conv": L.conv_init(next(keys), spatial, spatial, 512, 512, groups=512),
        "bn": L.bn_init(512),
    }
    params["fc"] = L.linear_init(next(keys), 512, feature_dim, bias=False)
    params["features_bn"] = L.bn_init(feature_dim)
    return params


def _arch_of(params: Dict) -> str:
    for arch, (blocks, scale) in MBF_SPECS.items():
        if len(params["body"]) == len(_body_plan(blocks, scale)):
            return arch
    raise ValueError(f"unrecognized mbf body depth {len(params['body'])}")


def apply(
    params: Dict,
    x: jnp.ndarray,
    compute_dtype=jnp.float32,
    train: bool = False,
    conv_fn=None,
    linear_fn=None,
):
    """Forward pass. x: (B, S, S, 3) normalized [-1, 1] RGB, NHWC.

    Returns (B, 512) float32 features; with train=True also returns the
    dict of per-BN batch stats (keys like "body/3/dw_bn") for
    layers.update_bn_stats.

    conv_fn/linear_fn override the conv/FC ops (models/quant.py hooks;
    grouped/depthwise convs are passed groups= and stay unquantized
    there — they are VPU-bound).
    """
    conv_fn = conv_fn or L.conv2d
    linear_fn = linear_fn or L.linear
    x = x.astype(compute_dtype)
    all_stats: Dict = {} if train else None
    blocks, scale = MBF_SPECS[_arch_of(params)]
    plan = _body_plan(blocks, scale)

    def bn(path, node, key, v):
        if key not in node:  # folded into the preceding conv
            return v
        y, s = L.batch_norm(node[key], v, train)
        if all_stats is not None and s is not None:
            all_stats[path] = s
        return y

    p = params["stem"]
    out = conv_fn(p["conv"], x, 2, 1, compute_dtype=compute_dtype)
    out = bn("stem/bn", p, "bn", out)
    out = L.prelu(p["prelu"], out)

    p = params["stem_dw"]
    out = conv_fn(p["conv"], out, 1, 1, groups=64, compute_dtype=compute_dtype)
    out = bn("stem_dw/bn", p, "bn", out)
    out = L.prelu(p["prelu"], out)

    for i, ((_cin, _cout, g, stride), blk) in enumerate(zip(plan, params["body"])):
        y = conv_fn(blk["pw1"], out, 1, 0, compute_dtype=compute_dtype)
        y = bn(f"body/{i}/pw1_bn", blk, "pw1_bn", y)
        y = L.prelu(blk["pw1_prelu"], y)
        y = conv_fn(blk["dw"], y, stride, 1, groups=g, compute_dtype=compute_dtype)
        y = bn(f"body/{i}/dw_bn", blk, "dw_bn", y)
        y = L.prelu(blk["dw_prelu"], y)
        y = conv_fn(blk["pw2"], y, 1, 0, compute_dtype=compute_dtype)
        y = bn(f"body/{i}/pw2_bn", blk, "pw2_bn", y)
        out = out + y if stride == 1 else y  # residual only at stride 1

    p = params["conv_sep"]
    out = conv_fn(p["conv"], out, 1, 0, compute_dtype=compute_dtype)
    out = bn("conv_sep/bn", p, "bn", out)
    out = L.prelu(p["prelu"], out)

    p = params["gdc_dw"]
    out = conv_fn(p["conv"], out, 1, 0, groups=512, compute_dtype=compute_dtype)
    out = bn("gdc_dw/bn", p, "bn", out)

    out = out.reshape(out.shape[0], -1)  # (B, 1, 1, 512) → (B, 512)
    out = linear_fn(params["fc"], out, compute_dtype=compute_dtype)
    out = bn("features_bn", params, "features_bn", out)
    out = out.astype(jnp.float32)
    return (out, all_stats) if train else out


def fold_inference_params(params: Dict) -> Dict:
    """Fold EVERY BatchNorm into its preceding conv/FC — all of mbf's
    BNs are post-conv, so unlike IResNet (models/arcface.py, which keeps
    its pre-conv half) the folded network has no BN ops at all. Exact
    for any padding (layers.fold_bn_into_conv). Folded params are not
    trainable."""
    def fold_cbp(p):
        out = {"conv": L.fold_bn_into_conv(p["conv"], p["bn"])}
        if "prelu" in p:
            out["prelu"] = p["prelu"]
        return out

    out: Dict = {
        "stem": fold_cbp(params["stem"]),
        "stem_dw": fold_cbp(params["stem_dw"]),
        "conv_sep": fold_cbp(params["conv_sep"]),
        "gdc_dw": fold_cbp(params["gdc_dw"]),
        "fc": L.fold_bn_into_linear(params["fc"], params["features_bn"]),
    }
    body = []
    for blk in params["body"]:
        body.append(
            {
                "pw1": L.fold_bn_into_conv(blk["pw1"], blk["pw1_bn"]),
                "pw1_prelu": blk["pw1_prelu"],
                "dw": L.fold_bn_into_conv(blk["dw"], blk["dw_bn"]),
                "dw_prelu": blk["dw_prelu"],
                "pw2": L.fold_bn_into_conv(blk["pw2"], blk["pw2_bn"]),
            }
        )
    out["body"] = body
    return out


update_bn_stats = L.update_bn_stats


def num_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
