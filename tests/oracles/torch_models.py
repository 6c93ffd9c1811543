"""Torch-CPU oracle implementations for golden-parity tests.

With no ONNX Runtime in the image and no .onnx weight files shipped
(reference models/README.md documents them as external downloads), the
numeric oracle for the JAX networks is an independent torch
re-implementation of the same topology that CONSUMES the same params
pytree. Different conv backend (oneDNN) + different layout (NCHW) →
agreement within float tolerance validates both topology wiring and
numerics (SURVEY.md §4.2).
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def conv2d(p, x, stride=1, pad=0, groups=1):
    w = _t(p["w"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = _t(p["b"]) if "b" in p else None
    return F.conv2d(x, w, b, stride=stride, padding=pad, groups=groups)


def bn(p, x, eps=1e-5):
    if x.ndim == 2:
        return F.batch_norm(
            x, _t(p["mean"]), _t(p["var"]), _t(p["scale"]), _t(p["bias"]),
            training=False, eps=eps,
        )
    return F.batch_norm(
        x, _t(p["mean"]), _t(p["var"]), _t(p["scale"]), _t(p["bias"]),
        training=False, eps=eps,
    )


def prelu(p, x):
    return F.prelu(x, _t(p["alpha"]))


def scrfd_forward(params, x_nhwc: np.ndarray):
    """Run the SCRFD topology in torch. Returns {stride: (scores, bbox, kps)}
    with the same shapes/conventions as models/scrfd.py."""
    from facerecognizeonnx_tpu.models.scrfd import (
        _BACKBONE_PLAN,
        _TAPS,
        NUM_ANCHORS,
        STRIDES,
    )

    def dwsep(p, x, stride):
        if "conv" in p:  # dense (TPU) block
            return prelu(p["prelu"], bn(p["bn"], conv2d(p["conv"], x, stride, 1)))
        cin = x.shape[1]
        y = conv2d({"w": p["dw"]["w"]}, x, stride, 1, groups=cin)
        y = bn(p["dw_bn"], y)
        y = prelu(p["dw_prelu"], y)
        y = conv2d(p["pw"], y, 1, 0)
        y = bn(p["pw_bn"], y)
        y = prelu(p["pw_prelu"], y)
        return y

    with torch.no_grad():
        x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
        p = params["stem"]
        y = prelu(p["prelu"], bn(p["bn"], conv2d(p["conv"], x, 2, 1)))
        taps = {}
        for (cout, stride), blk in zip(_BACKBONE_PLAN[1:], params["backbone"]):
            y = dwsep(blk, y, stride)
            if cout in _TAPS and stride == 1:
                taps[_TAPS[cout]] = y
        n = params["neck"]
        p5 = conv2d(n["lat_c5"], taps["c5"], 1, 0)
        p4 = conv2d(n["lat_c4"], taps["c4"], 1, 0) + F.interpolate(p5, scale_factor=2, mode="nearest")
        p3 = conv2d(n["lat_c3"], taps["c3"], 1, 0) + F.interpolate(p4, scale_factor=2, mode="nearest")
        p3 = conv2d(n["smooth_p3"], p3, 1, 1)
        p4 = conv2d(n["smooth_p4"], p4, 1, 1)
        p5 = conv2d(n["smooth_p5"], p5, 1, 1)
        outs = {}
        for stride, feat in zip(STRIDES, (p3, p4, p5)):
            h = feat
            for cp in params["head"]["convs"]:
                h = prelu(cp["prelu"], bn(cp["bn"], conv2d(cp["conv"], h, 1, 1)))
            scale = float(np.asarray(params["scales"][f"s{stride}"]))
            cls = conv2d(params["head"]["cls"], h, 1, 1)
            bbx = conv2d(params["head"]["bbox"], h, 1, 1) * scale
            kps = conv2d(params["head"]["kps"], h, 1, 1) * scale

            def r(t, c):
                # NCHW -> NHWC -> (B, H*W*A, c), anchor fastest
                t = t.permute(0, 2, 3, 1)
                b_, hh, ww, _ = t.shape
                return t.reshape(b_, hh * ww * NUM_ANCHORS, c).numpy()

            outs[stride] = (r(torch.sigmoid(cls), 1), r(bbx, 4), r(kps, 10))
        return outs


def mobilefacenet_forward(params, x_nhwc: np.ndarray) -> np.ndarray:
    """Run the MobileFaceNet topology in torch. x_nhwc: (B, S, S, 3) f32.

    Consumes models/mobilefacenet.py's (unfolded) params pytree; the
    body plan is re-derived from the same spec table so the oracle stays
    an independent executor, not a re-export."""
    from facerecognizeonnx_tpu.models.mobilefacenet import (
        MBF_SPECS,
        _body_plan,
    )

    blocks, scale = next(
        (b, s)
        for b, s in MBF_SPECS.values()
        if len(_body_plan(b, s)) == len(params["body"])
    )
    plan = _body_plan(blocks, scale)

    def cbp(p, x, stride=1, pad=0, groups=1):
        y = conv2d(p, x, stride, pad, groups)
        return y

    with torch.no_grad():
        x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
        p = params["stem"]
        out = prelu(p["prelu"], bn(p["bn"], cbp(p["conv"], x, 2, 1)))
        p = params["stem_dw"]
        out = prelu(p["prelu"], bn(p["bn"], cbp(p["conv"], out, 1, 1, groups=64)))
        for (cin, cout, g, stride), blk in zip(plan, params["body"]):
            y = prelu(blk["pw1_prelu"], bn(blk["pw1_bn"], cbp(blk["pw1"], out)))
            y = prelu(
                blk["dw_prelu"],
                bn(blk["dw_bn"], cbp(blk["dw"], y, stride, 1, groups=g)),
            )
            y = bn(blk["pw2_bn"], cbp(blk["pw2"], y))
            out = out + y if stride == 1 else y
        p = params["conv_sep"]
        out = prelu(p["prelu"], bn(p["bn"], cbp(p["conv"], out)))
        p = params["gdc_dw"]
        out = bn(p["bn"], cbp(p["conv"], out, 1, 0, groups=512))
        out = out.permute(0, 2, 3, 1).reshape(out.shape[0], -1)  # (B, 512)
        out = out @ _t(params["fc"]["w"])
        out = bn(params["features_bn"], out)
        return out.numpy()


def iresnet_forward(params, x_nhwc: np.ndarray) -> np.ndarray:
    """Run the IResNet topology in torch. x_nhwc: (B, S, S, 3) float32."""
    with torch.no_grad():
        x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)
        out = conv2d(params["conv1"], x, 1, 1)
        out = bn(params["bn1"], out)
        out = prelu(params["prelu1"], out)
        for s in (1, 2, 3, 4):
            for i, blk in enumerate(params[f"layer{s}"]):
                stride = 2 if i == 0 else 1
                o = bn(blk["bn1"], out)
                o = conv2d(blk["conv1"], o, 1, 1)
                o = bn(blk["bn2"], o)
                o = prelu(blk["prelu"], o)
                o = conv2d(blk["conv2"], o, stride, 1)
                o = bn(blk["bn3"], o)
                if "down_conv" in blk:
                    idn = conv2d(blk["down_conv"], out, stride, 0)
                    idn = bn(blk["down_bn"], idn)
                else:
                    idn = out
                out = o + idn
        out = bn(params["bn2"], out)
        # match the JAX NHWC flatten order
        out = out.permute(0, 2, 3, 1).reshape(out.shape[0], -1)
        w = _t(params["fc"]["w"])
        out = out @ w + _t(params["fc"]["b"])
        out = bn(params["features_bn"], out)
        return out.numpy()


def vit_forward(params, x_nhwc: np.ndarray) -> np.ndarray:
    """ViT face embedder (models/vit.py topology) in torch, consuming
    the same params pytree. Patchify → pre-LN blocks → mean-pool head."""
    dim = np.asarray(params["patch"]["w"]).shape[1]
    from facerecognizeonnx_tpu.models.vit import PATCH, VIT_SPECS_BY_DIM

    heads = VIT_SPECS_BY_DIM[dim][2]
    x = _t(x_nhwc)  # (B, S, S, 3) — patchify in the same NHWC order
    b, s = x.shape[0], x.shape[1]
    g = s // PATCH
    t = x.reshape(b, g, PATCH, g, PATCH, 3).permute(0, 1, 3, 2, 4, 5)
    t = t.reshape(b, g * g, PATCH * PATCH * 3)

    def lin(p, v):
        return F.linear(v, _t(p["w"]).T, _t(p["b"]) if "b" in p else None)

    def ln(p, v):
        return F.layer_norm(v, (v.shape[-1],), _t(p["scale"]), _t(p["bias"]),
                            eps=1e-6)

    h = lin(params["patch"], t) + _t(params["pos_embed"])
    n_tok = h.shape[1]
    dh = dim // heads
    for blk in params["blocks"]:
        q, k, v = lin(blk["qkv"], ln(blk["ln1"], h)).reshape(
            b, n_tok, 3, heads, dh
        ).permute(2, 0, 3, 1, 4)  # (3, B, H, T, dh)
        attn = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, n_tok, dim)
        h = h + lin(blk["proj"], o)
        m = ln(blk["ln2"], h)
        h = h + lin(blk["mlp2"], F.gelu(lin(blk["mlp1"], m)))
    h = ln(params["ln_f"], h).mean(dim=1)
    out = lin(params["fc"], h)
    if "features_bn" in params:
        out = bn(params["features_bn"], out)
    return out.numpy()
