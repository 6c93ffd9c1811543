"""Fully-fused frame→features program (the flagship TPU path).

One XLA program runs the entire reference `compare`/`webcam` inner loop
(SURVEY.md §3.1/§3.3) for a BATCH of frames: normalize → SCRFD →
decode → top-k → NMS → per-face umeyama align → warp → IResNet embed →
L2 norm. No host round-trip between decode and embedding (BASELINE.json
north star: "no pixel touches host between decode and embedding").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import decode_outputs
from facerecognizeonnx_tpu.detect.pipeline import postprocess
from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch, embed_crops
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.ops.image import normalize_to_rgb
from facerecognizeonnx_tpu.types import Detections


def detect_topk(
    det_params,
    frames_u8: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int = 8,
    compute_dtype=None,
    valid_cap: int = None,
) -> Tuple[Detections, Detections]:
    """Front half of the fused program: frames → (all Detections,
    top-K Detections selected for embedding).

    valid_cap is a BENCHMARK control: when set, exactly the first
    `valid_cap` of the K embed slots are treated as occupied, regardless
    of what the detector found — synthetic bench frames produce
    arbitrary detections, so this is the only way to measure the
    production `skip_invalid_faces` path at a known per-frame occupancy
    (e.g. 2/8). Returned Detections are unaffected; only the embed
    slots' validity is forced. Leave None in production.
    """
    dtype = jnp.dtype(cfg.compute_dtype) if compute_dtype is None else compute_dtype
    x = normalize_to_rgb(frames_u8, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
    if hasattr(det_params, "apply"):  # OnnxRunner from a real det_*.onnx
        outs = det_params.apply(x, dtype)
    else:
        outs = scrfd.apply(det_params, x, compute_dtype=dtype)
    scores, boxes, kps = decode_outputs(outs, cfg.det_input_size, cfg.num_anchors)

    dets = jax.vmap(lambda s, b, k: postprocess(s, b, k, 1.0, cfg))(
        scores, boxes, kps
    )

    k = max_faces_embed
    valid_k = dets.valid[:, :k]
    if valid_cap is not None:
        valid_k = jnp.broadcast_to(
            jnp.arange(k)[None, :] < valid_cap, valid_k.shape
        )
    top = Detections(
        boxes=dets.boxes[:, :k],
        scores=dets.scores[:, :k],
        kps=dets.kps[:, :k],
        valid=valid_k,
    )
    return dets, top


def frames_to_features(
    det_params,
    arc_params,
    frames_u8: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int = 8,
    compute_dtype=None,
    valid_cap: int = None,
) -> Tuple[Detections, jnp.ndarray]:
    """(B, S, S, 3) letterboxed BGR frames → (Detections, (B, K, 512)).

    K = max_faces_embed top-scoring faces per frame are aligned and
    embedded (invalid slots give zero features). Detections are in
    letterboxed-frame pixels. See detect_topk for the valid_cap bench
    control.
    """
    dtype = jnp.dtype(cfg.compute_dtype) if compute_dtype is None else compute_dtype
    dets, top = detect_topk(
        det_params, frames_u8, cfg, max_faces_embed, dtype, valid_cap
    )

    # normalized=True fuses (px-mean)/scale + BGR→RGB + bf16 cast into
    # the warp kernel's epilogue; valid skips unoccupied face slots'
    # warp work entirely (the reference embeds only detected faces,
    # src/main.cpp:226 — all-K bench frames still compute every slot)
    crops = align_faces_batch(
        frames_u8, top.kps, top.boxes, cfg,
        valid=top.valid if cfg.skip_invalid_faces else None,
        normalized=True,
    )
    valids = top.valid
    b, kk = crops.shape[0], crops.shape[1]
    feats = embed_crops(
        arc_params, crops.reshape((b * kk,) + crops.shape[2:]), cfg, dtype,
        normalized=True,
    )
    feats = feats.reshape(b, kk, -1) * valids[..., None].astype(jnp.float32)
    return dets, feats


def frames_to_matches(
    det_params,
    arc_params,
    frames_u8: jnp.ndarray,
    bank_padded: jnp.ndarray,
    n_rows: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int = 8,
    top_k: int = 5,
    compute_dtype=None,
    valid_cap: int = None,
):
    """ONE-dispatch identify: frames → features → gallery top-k, fused.

    The serving identify otherwise costs TWO host↔device round trips
    (the fused feature program, a host sync of (B, K, 512) feats, then
    the gallery-search program); on a tunneled host each round trip is
    ~25 ms wall against ~2.5 ms of device work (docs/PERFORMANCE.md
    latency config), so fusing the search halves single-frame identify
    wall latency. The reference's webcam loop is the same
    embed-then-compare sequence, strictly serial on CPU
    (src/main.cpp:226-234).

    bank_padded: (Gpad, D) L2-normalized gallery rows, zero-padded to a
    size bucket (GalleryBank.device_bank_padded) so enrolls don't
    recompile until the bucket grows. n_rows: TRACED int32 scalar —
    rows ≥ n_rows are masked to sim −1 before top_k, so mutating the
    gallery within a bucket reuses the compiled program.

    Returns (Detections, (B, K, D) feats, (B, K, top_k) sims on the
    (cos+1)/2 scale, (B, K, top_k) int32 row indices). Masked/pad
    entries carry sim −1 and an arbitrary index — consumers drop
    idx ≥ n_rows (invalid face slots keep zero feats: their sims are
    uniformly 0.5 against every row, same as the two-dispatch path,
    and are dropped by the valid mask exactly as there).
    """
    from facerecognizeonnx_tpu.match.similarity import similarity_matrix

    dets, feats = frames_to_features(
        det_params, arc_params, frames_u8, cfg, max_faces_embed,
        compute_dtype, valid_cap,
    )
    b, k, d = feats.shape
    sims = similarity_matrix(feats.reshape(b * k, d), bank_padded)
    mask = jnp.arange(bank_padded.shape[0])[None, :] < n_rows
    sims = jnp.where(mask, sims, -1.0)
    v, i = jax.lax.top_k(sims, top_k)
    return dets, feats, v.reshape(b, k, top_k), i.reshape(b, k, top_k)
