"""Vision-Transformer face embedding network (TPU-first family).

The reference's recognizer contract is "112x112x3 normalized RGB in,
512-d feature out, L2-normalized downstream" (models/README.md:15-19,
src/face_recognizer.cpp:270-304); models/arcface.py and
models/mobilefacenet.py cover the buffalo convnet members of that
contract. This module adds a ViT member — the architecture InsightFace
ships in its transformer packs — designed MXU-first rather than ported:
every FLOP is a dense matmul (patch embedding included: stride=patch
conv ≡ reshape + one GEMM, written as such), there are no depthwise
convs, no im2col, no padding seams, and the token count (196) rides the
batch dimension so the GEMMs stay large at serving batch sizes.
Measured reality (docs/PERFORMANCE.md "ViT recognizer family"): the
K=D contractions cap the per-block GEMMs at ~38% of bf16 peak for
vit_t's D=256, and the 24 LayerNorms cost VPU reductions BN can fold
away — so the family ships as the ACCURACY tier of the recognizer
surface (transformer face models out-rank same-param convnets on the
public benchmarks) while mbf/iresnet50 keep the throughput roles.

Topology (pre-LN ViT, spec-level — not a weight-compatible port):
  patch:  112x112x3 → 14x14 non-overlapping 8x8 patches → (196, 192)
          → linear to D, + learned positional embedding
  blocks: depth x [LN → MHA(H heads, D/H each) → +res,
                   LN → MLP(D→4D→D, GELU) → +res]
  head:   LN → token mean-pool → FC(D→512) → BN1d

Family members (dim, depth, heads): vit_t (256, 12, 2),
vit_s (384, 12, 3), vit_b (512, 12, 4) — ~3.8 / 8.5 / 15 GFLOP/face.
Head count is HALVED vs InsightFace's published configs (4/6/8) because
head width is pinned to dh = dim/heads = 128, the MXU tile width — see
the VIT_SPECS comment below for the measured rationale.

Output is NOT L2-normalized here; the embed pipeline normalizes,
matching the reference's post-Run normalize (src/face_recognizer.cpp:297).
`linear_fn` hooks every GEMM, so w8a8 PTQ (models/quant.py) applies
unchanged; train=True returns the head-BN batch stats under the same
contract as the conv families (layers.update_bn_stats paths).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.models import layers as L

# arch → (embed dim, depth, heads). Patch size fixed at 8 (112 → 14x14).
# Head width is pinned to dh = 128 — the MXU contraction / VPU lane
# width. Measured (tools/exp_vit_phase.py ablations): dh=64 heads cost
# ~28.5 ms/forward of the batch-256 vit_t in attention layout padding
# (64 lanes pads to 128) and K=64 matmul contractions; fewer, 128-wide
# heads do the same attention math at full tile utilization.
VIT_SPECS = {
    "vit_t": (256, 12, 2),
    "vit_s": (384, 12, 3),
    "vit_b": (512, 12, 4),
}

PATCH = 8


def _ln_init(d: int):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_params(
    key,
    arch: str = "vit_t",
    input_size: int = 112,
    feature_dim: int = 512,
) -> Dict:
    dim, depth, heads = VIT_SPECS[arch]
    if input_size % PATCH:
        raise ValueError(f"input_size {input_size} not divisible by {PATCH}")
    n_tok = (input_size // PATCH) ** 2
    pdim = PATCH * PATCH * 3
    keys = iter(jax.random.split(key, 3 + 4 * depth))

    params: Dict = {
        "patch": L.linear_init(next(keys), pdim, dim),
        "pos_embed": jax.random.normal(next(keys), (n_tok, dim), jnp.float32)
        * 0.02,
    }
    blocks = []
    for _ in range(depth):
        blocks.append(
            {
                "ln1": _ln_init(dim),
                "qkv": L.linear_init(next(keys), dim, 3 * dim),
                "proj": L.linear_init(next(keys), dim, dim),
                "ln2": _ln_init(dim),
                "mlp1": L.linear_init(next(keys), dim, 4 * dim),
                "mlp2": L.linear_init(next(keys), 4 * dim, dim),
            }
        )
    params["blocks"] = blocks
    params["ln_f"] = _ln_init(dim)
    params["fc"] = L.linear_init(next(keys), dim, feature_dim)
    params["features_bn"] = L.bn_init(feature_dim)
    return params


def _layer_norm(p, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(x.dtype)


def _patchify(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, S, S, 3) → (B, T, PATCH*PATCH*3) — the stride-8 patch conv as
    the reshape+GEMM it lowers to, stated explicitly."""
    b = x.shape[0]
    g = size // PATCH
    x = x.reshape(b, g, PATCH, g, PATCH, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gy, gx, py, px, 3)
    return x.reshape(b, g * g, PATCH * PATCH * 3)


def _attention(p, x2: jnp.ndarray, b: int, t: int, heads: int, dtype,
               linear_fn) -> jnp.ndarray:
    """MHA on the 2-D-resident stream: (B*T, D) in, (B*T, D) out.

    Measured on v5e (tools/exp_vit_phase.py): a rank-3 (B, 196, D)
    residual stream costs ~23 ms/forward in sublane-padding relayouts
    (196 pads to 208) — every (B,T,D)↔(B*T,D) reshape is a real copy.
    Keeping the stream 2-D makes those reshapes bitcasts; only the
    attention einsums (which transpose internally regardless) and the
    pos-embed add ever see rank > 2."""
    d = x2.shape[-1]
    dh = d // heads
    qkv = linear_fn(p["qkv"], x2, compute_dtype=dtype).astype(dtype)
    # lane-aligned column slices (d multiple of 128) — no relayout
    q = qkv[:, :d].reshape(b, t, heads, dh)
    k = qkv[:, d:2 * d].reshape(b, t, heads, dh)
    v = qkv[:, 2 * d:].reshape(b, t, heads, dh)
    # scores in f32: 196-token softmax is cheap, and bf16 logits cost
    # real cosine error for zero wall-clock gain at this T
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return linear_fn(p["proj"], out.reshape(b * t, d), compute_dtype=dtype
                     ).astype(dtype)


def apply(
    params: Dict,
    x: jnp.ndarray,
    compute_dtype=jnp.float32,
    train: bool = False,
    conv_fn=None,  # unused (no convs); kept for the family-wide signature
    linear_fn=None,
) -> jnp.ndarray | Tuple[jnp.ndarray, Dict]:
    """Forward pass. x: (B, S, S, 3) normalized [-1, 1] RGB, NHWC.

    Returns (B, 512) float32 features; with train=True also the head-BN
    batch stats dict ({"features_bn": ...}) for running-average updates.
    linear_fn hooks every GEMM (same signature as layers.linear) —
    models/quant.py uses it for w8a8."""
    linear_fn = linear_fn or L.linear
    dtype = compute_dtype
    # infer the arch from pos_embed (survives quant weight-stripping,
    # unlike the patch GEMM's float weights)
    heads = VIT_SPECS_BY_DIM[params["pos_embed"].shape[1]][2]

    tokens = _patchify(x.astype(dtype), x.shape[1])
    b, t, pdim = tokens.shape
    h = linear_fn(params["patch"], tokens.reshape(b * t, pdim),
                  compute_dtype=dtype).astype(dtype)
    # one rank-3 trip for the pos-embed broadcast; the residual stream
    # then stays (B*T, D) — see _attention docstring for why
    h = (h.reshape(b, t, -1) + params["pos_embed"].astype(dtype)
         ).reshape(b * t, -1)

    for blk in params["blocks"]:
        h = h + _attention(blk, _layer_norm(blk["ln1"], h), b, t, heads,
                           dtype, linear_fn)
        m = _layer_norm(blk["ln2"], h)
        m = linear_fn(blk["mlp1"], m, compute_dtype=dtype)
        m = jax.nn.gelu(m.astype(dtype), approximate=False)  # exact erf (torch/ONNX default)
        m = linear_fn(blk["mlp2"], m, compute_dtype=dtype).astype(dtype)
        h = h + m

    h = _layer_norm(params["ln_f"], h).reshape(b, t, -1).mean(axis=1)
    out = linear_fn(params["fc"], h, compute_dtype=dtype)
    stats: Dict = {}
    if "features_bn" in params:  # folded into fc by fold_inference_params()
        out, s = L.batch_norm(params["features_bn"], out, train)
        if train and s is not None:
            stats["features_bn"] = s
    out = out.astype(jnp.float32)
    return (out, stats) if train else out


# patch-linear output dim → spec (apply() infers the arch from params)
VIT_SPECS_BY_DIM = {dim: (dim, depth, heads)
                    for dim, depth, heads in VIT_SPECS.values()}


def fold_inference_params(params: Dict) -> Dict:
    """Fold the head BN1d into the FC (LayerNorms cannot fold — their
    stats are data-dependent). Folded params are NOT trainable."""
    out = {k: v for k, v in params.items()
           if k not in ("fc", "features_bn")}
    out["fc"] = L.fold_bn_into_linear(params["fc"], params["features_bn"])
    return out


update_bn_stats = L.update_bn_stats


def num_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
