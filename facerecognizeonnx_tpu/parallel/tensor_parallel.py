"""Tensor-parallel (channel-sharded) IResNet embedding inference.

The reference embeds each face on one CPU session (`Ort::Session::Run`,
src/face_recognizer.cpp:279-283); its only intra-model parallelism is
the 4-thread ORT op pool. The TPU-native analog of "split one model
across compute units" is Megatron-style channel sharding over a mesh
"model" axis, and this module provides it for the IResNet family:

  * block conv1 is COLUMN-parallel — output channels shard over the
    axis, each chip holding a (3,3,Cin,Cout/P) weight slice; the
    following per-channel BN/PReLU act on local channels with sharded
    per-channel params;
  * block conv2 is ROW-parallel — input channels shard, each chip
    contributes a partial sum over its slice, ONE `lax.psum` per block
    restores the full activation (the bias is added after the psum so
    it is counted once);
  * the residual/downsample path and pre-conv BNs act on replicated
    activations and stay replicated (1x1 downsamples are ~2% of block
    FLOPs — recomputing them everywhere is cheaper than gathering);
  * the head FC is column-parallel with a feature-axis `all_gather`.

The ViT family (models/vit.py) gets the textbook Megatron mapping:
qkv and mlp1 are column-parallel (attention HEADS shard with the qkv
columns — pack_tp_params splits the fused qkv so a contiguous column
shard is a contiguous head group), proj and mlp2 are row-parallel with
one psum each — two psums per block, the residual stream replicated.

Why this is worth having even though one v5e chip fits w600k_r50
easily: each chip keeps 1/P of the conv weights resident (HBM headroom
for giant galleries co-resident with the model), per-chip FLOPs drop
by ~P at small batch (the latency lever the fused batch amortization
cannot reach), and the pattern extends unchanged to recognizers too
large for one chip. Composes with data parallelism on a
("data", "model") mesh: crops shard over "data", each data replica
runs the channel-sharded forward over its "model" column.

Inference-only: apply(train=True) batch stats are cross-channel
reductions this schedule does not implement (train tp lives in the
partial-FC classifier, train/trainer.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import layers as L
from facerecognizeonnx_tpu.models.layers import l2_normalize
from facerecognizeonnx_tpu.ops.image import normalize_to_rgb
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.sharded_ops import shard_map

_REP = P()


def _conv_spec(p, w_spec, b_spec):
    out = {"w": w_spec}
    if "b" in p:
        out["b"] = b_spec
    return out


def _bn_spec(spec):
    return {"scale": spec, "bias": spec, "mean": spec, "var": spec}


def pack_tp_params(params: Dict) -> Dict:
    """Repack a param tree for tensor-parallel sharding.

    ViT: split each block's fused qkv GEMM into per-projection wq/wk/wv
    so a contiguous column shard of each equals a contiguous group of
    HEADS (q's columns are head-major — models/vit.py _attention slices
    then reshapes (B*T, D) → (B, T, H, dh)); the fused [q|k|v] column
    order would hand chip 0 "all of q and half of k" instead.
    IResNet/other trees pass through unchanged.
    """
    if "pos_embed" not in params:
        return params
    out = {k: v for k, v in params.items() if k != "blocks"}
    blocks = []
    for blk in params["blocks"]:
        d = blk["qkv"]["w"].shape[0]
        nb = {k: v for k, v in blk.items() if k != "qkv"}
        w, b = blk["qkv"]["w"], blk["qkv"]["b"]
        nb["wq"] = {"w": w[:, :d], "b": b[:d]}
        nb["wk"] = {"w": w[:, d:2 * d], "b": b[d:2 * d]}
        nb["wv"] = {"w": w[:, 2 * d:], "b": b[2 * d:]}
        blocks.append(nb)
    out["blocks"] = blocks
    return out


def validate_tp_width(params: Dict, n_shards: int, axis: str = "model"):
    """Fail loudly BEFORE tracing when the arch can't shard `n_shards`
    ways: a ViT whose head count doesn't divide the model axis would
    otherwise die deep inside shard_map with an opaque reshape error
    (hl = dloc // dh == 0). Call from every tp entry point
    (tp_embed_crops AND the dp x pp x tp pipeline path)."""
    if "pos_embed" in params:
        from facerecognizeonnx_tpu.models.vit import VIT_SPECS_BY_DIM

        heads = VIT_SPECS_BY_DIM[params["pos_embed"].shape[1]][2]
        if heads % n_shards:
            raise ValueError(
                f"vit tensor parallelism shards heads: {heads} heads do "
                f"not divide over {n_shards} '{axis}' shards"
            )


def recognizer_param_specs(params: Dict, axis: str = "model") -> Dict:
    """PartitionSpec pytree (same structure as `params`) for tensor-
    parallel inference over mesh axis `axis`.

    IResNet: Megatron conv sharding (module docstring). ViT (pass the
    pack_tp_params output): textbook Megatron — qkv/mlp1 column-parallel,
    proj/mlp2 row-parallel, attention heads shard with the qkv columns.
    Works on folded and unfolded trees. Raises on MobileFaceNet (its
    depthwise body has no free channel axis worth sharding at 112px;
    use dp for it).
    """
    if "pos_embed" in params:
        return _vit_param_specs(params, axis)
    if "layer1" not in params:
        raise ValueError(
            "tensor-parallel embed supports IResNet and ViT param trees "
            "only (MobileFaceNet shards over 'data' instead)"
        )
    col_w = P(None, None, None, axis)  # HWIO: shard O
    row_w = P(None, None, axis, None)  # HWIO: shard I
    vec = P(axis)

    specs: Dict = {
        "conv1": _conv_spec(params["conv1"], _REP, _REP),
        "prelu1": {"alpha": _REP},
    }
    if "bn1" in params:
        specs["bn1"] = _bn_spec(_REP)
    for s in (1, 2, 3, 4):
        stage = []
        for block in params[f"layer{s}"]:
            nb = {
                "bn1": _bn_spec(_REP),
                "conv1": _conv_spec(block["conv1"], col_w, vec),
                "prelu": {"alpha": vec},
                "conv2": _conv_spec(block["conv2"], row_w, _REP),
            }
            if "bn2" in block:
                nb["bn2"] = _bn_spec(vec)
            if "bn3" in block:
                nb["bn3"] = _bn_spec(_REP)
            if "down_conv" in block:
                nb["down_conv"] = _conv_spec(block["down_conv"], _REP, _REP)
            if "down_bn" in block:
                nb["down_bn"] = _bn_spec(_REP)
            stage.append(nb)
        specs[f"layer{s}"] = stage
    specs["bn2"] = _bn_spec(_REP)
    specs["fc"] = {"w": P(None, axis)}
    if "b" in params["fc"]:
        specs["fc"]["b"] = vec
    if "features_bn" in params:
        specs["features_bn"] = _bn_spec(_REP)
    return specs


def _vit_param_specs(params: Dict, axis: str = "model") -> Dict:
    if "blocks" in params and params["blocks"] and "qkv" in params["blocks"][0]:
        raise ValueError(
            "vit param tree still has fused qkv blocks — call "
            "pack_tp_params(params) before recognizer_param_specs"
        )
    col = {"w": P(None, axis), "b": P(axis)}
    row_w = P(axis, None)
    ln = {"scale": _REP, "bias": _REP}
    specs: Dict = {
        "patch": {"w": _REP, "b": _REP},
        "pos_embed": _REP,
        "ln_f": ln,
        "fc": {"w": P(None, axis)},
    }
    if "b" in params["fc"]:
        specs["fc"]["b"] = P(axis)
    if "features_bn" in params:
        specs["features_bn"] = _bn_spec(_REP)
    specs["blocks"] = [
        {
            "ln1": ln,
            "wq": dict(col),
            "wk": dict(col),
            "wv": dict(col),
            "proj": {"w": row_w, "b": _REP},
            "ln2": ln,
            "mlp1": dict(col),
            "mlp2": {"w": row_w, "b": _REP},
        }
        for _ in params["blocks"]
    ]
    return specs


def _bn(p, x):
    return L.batch_norm(p, x, train=False)[0]


def _tp_block(p, x, stride, dtype, axis):
    """One IBasicBlock, channel-sharded (column conv1 → row conv2 → psum).

    Mirrors models/arcface._block_apply math exactly; the only
    communication is the per-block psum (bias counted once, after)."""
    out = _bn(p["bn1"], x)
    out = L.conv2d(p["conv1"], out, 1, 1, compute_dtype=dtype)
    if "bn2" in p:
        out = _bn(p["bn2"], out)
    out = L.prelu(p["prelu"], out)
    out = L.conv2d({"w": p["conv2"]["w"]}, out, stride, 1, compute_dtype=dtype)
    out = lax.psum(out, axis)
    if "b" in p["conv2"]:
        out = (out + p["conv2"]["b"].astype(jnp.float32)).astype(dtype)
    if "bn3" in p:
        out = _bn(p["bn3"], out)
    if "down_conv" in p:
        identity = L.conv2d(p["down_conv"], x, stride, 0, compute_dtype=dtype)
        if "down_bn" in p:
            identity = _bn(p["down_bn"], identity)
    else:
        identity = x
    return out + identity


def _vit_tp_block(p, h, b, t, dtype, axis, dh):
    """One pre-LN transformer block, Megatron-sharded: qkv column (heads
    shard with it), proj row + psum; mlp1 column, mlp2 row + psum —
    TWO psums per block, the residual stream stays replicated. `dh` is
    the head width from the arch spec (threaded in by _tp_apply_vit so a
    future non-128-wide spec computes correctly instead of silently
    mis-slicing heads)."""
    from facerecognizeonnx_tpu.models.vit import _layer_norm

    xin = _layer_norm(p["ln1"], h)
    wqkv = {
        "w": jnp.concatenate(
            [p["wq"]["w"], p["wk"]["w"], p["wv"]["w"]], axis=1
        ),
        "b": jnp.concatenate([p["wq"]["b"], p["wk"]["b"], p["wv"]["b"]]),
    }
    qkv = L.linear(wqkv, xin, compute_dtype=dtype).astype(dtype)
    dloc = qkv.shape[-1] // 3
    hl = dloc // dh  # local heads
    q = qkv[:, :dloc].reshape(b, t, hl, dh)
    k = qkv[:, dloc:2 * dloc].reshape(b, t, hl, dh)
    v = qkv[:, 2 * dloc:].reshape(b, t, hl, dh)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    out = L.linear(
        {"w": p["proj"]["w"]}, out.reshape(b * t, dloc), compute_dtype=dtype
    )
    out = lax.psum(out, axis)
    h = h + (out + p["proj"]["b"]).astype(dtype)

    m = _layer_norm(p["ln2"], h)
    m = L.linear(p["mlp1"], m, compute_dtype=dtype)
    m = jax.nn.gelu(m.astype(dtype), approximate=False)
    m = L.linear({"w": p["mlp2"]["w"]}, m, compute_dtype=dtype)
    m = lax.psum(m, axis)
    return h + (m + p["mlp2"]["b"]).astype(dtype)


def _tp_apply_vit(params: Dict, x: jnp.ndarray, axis: str, compute_dtype):
    from facerecognizeonnx_tpu.models.vit import (
        VIT_SPECS_BY_DIM,
        _layer_norm,
        _patchify,
    )

    dtype = compute_dtype
    # head width from the arch spec (dim inferred from pos_embed, same
    # trick as models/vit.apply) — NOT hardcoded to 128, so a future
    # spec with a different head width fails loudly in the lookup or
    # computes correctly, never mis-slices heads silently
    dim, _depth, heads = VIT_SPECS_BY_DIM[params["pos_embed"].shape[1]]
    dh = dim // heads
    tokens = _patchify(x.astype(dtype), x.shape[1])
    b, t, pdim = tokens.shape
    h = L.linear(
        params["patch"], tokens.reshape(b * t, pdim), compute_dtype=dtype
    ).astype(dtype)
    h = (h.reshape(b, t, -1) + params["pos_embed"].astype(dtype)
         ).reshape(b * t, -1)
    for blk in params["blocks"]:
        h = _vit_tp_block(blk, h, b, t, dtype, axis, dh)
    h = _layer_norm(params["ln_f"], h).reshape(b, t, -1).mean(axis=1)
    out = L.linear(params["fc"], h, compute_dtype=dtype)  # local dout/P
    out = lax.all_gather(out, axis, axis=1, tiled=True)
    if "features_bn" in params:
        out = _bn(params["features_bn"], out)
    return out.astype(jnp.float32)


def tp_apply(params: Dict, x: jnp.ndarray, axis: str, compute_dtype=jnp.float32):
    """Channel-sharded recognizer forward (call inside shard_map/pjit
    over `axis`; `params` leaves are the LOCAL shards per
    recognizer_param_specs — ViT trees packed by pack_tp_params).
    x: (B, S, S, 3) replicated, normalized RGB. Returns (B, 512)
    float32, replicated — same math as the model's
    apply(train=False) up to psum summation order.
    """
    if "pos_embed" in params:
        return _tp_apply_vit(params, x, axis, compute_dtype)
    x = x.astype(compute_dtype)
    out = L.conv2d(params["conv1"], x, 1, 1, compute_dtype=compute_dtype)
    if "bn1" in params:
        out = _bn(params["bn1"], out)
    out = L.prelu(params["prelu1"], out)
    for s in (1, 2, 3, 4):
        for b, block in enumerate(params[f"layer{s}"]):
            out = _tp_block(
                block, out, 2 if b == 0 else 1, compute_dtype, axis
            )
    out = _bn(params["bn2"], out)
    out = out.reshape(out.shape[0], -1)
    out = L.linear(params["fc"], out, compute_dtype=compute_dtype)  # local dout/P
    out = lax.all_gather(out, axis, axis=1, tiled=True)
    if "features_bn" in params:
        out = _bn(params["features_bn"], out)
    return out.astype(jnp.float32)


def tp_embed_crops(
    params: Dict,
    crops_bgr,
    cfg: PipelineConfig,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
    data_axis: str = "data",
    normalized: bool = False,
) -> jnp.ndarray:
    """Tensor-parallel embed_crops: (N, 112, 112, 3) crops → (N, 512)
    L2-normalized features, the recognizer channel-sharded over
    `mesh[axis]` (embed/pipeline.embed_crops is the single-chip oracle).

    If `data_axis` is also in the mesh (size > 1), crops additionally
    shard over it (dp × tp); N is padded up to the data shard count and
    stripped on return.
    """
    if mesh is None:
        n = len(jax.devices())
        mesh = make_mesh((axis,), (n,))
    params = pack_tp_params(params)
    validate_tp_width(params, mesh.shape[axis], axis)
    specs = recognizer_param_specs(params, axis)
    n_data = mesh.shape.get(data_axis, 1)
    has_data = data_axis in mesh.axis_names and n_data > 1
    dsh = P(data_axis) if has_data else P()

    crops_host = np.asarray(crops_bgr)
    n_real = crops_host.shape[0]
    pad = (-n_real) % n_data
    if pad:
        crops_host = np.concatenate(
            [crops_host, np.zeros((pad,) + crops_host.shape[1:],
                                  crops_host.dtype)], axis=0
        )

    dtype = jnp.dtype(cfg.compute_dtype)

    def body(p, crops_local):
        if normalized:
            xin = crops_local.astype(dtype)
        else:
            xin = normalize_to_rgb(
                crops_local, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype
            )
        feats = tp_apply(p, xin, axis, compute_dtype=dtype)
        return l2_normalize(feats)

    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda v: isinstance(v, P),
    )
    p_dev = jax.device_put(params, shardings)
    fn = jax.jit(
        shard_map(
            body, mesh=mesh, in_specs=(specs, dsh), out_specs=dsh,
            check_rep=False,
        )
    )
    x = jax.device_put(crops_host, NamedSharding(mesh, dsh))
    return fn(p_dev, x)[:n_real]
