"""Occupancy-adaptive bucketed embedding (production low-occupancy path).

The fused program (pipeline/fused.py) embeds ALL K face slots per frame
whether or not a detection occupies them — the honest bench contract,
but wasteful in production where frames carry 0-3 faces out of K=8. The
reference never pays for absent faces: its webcam loop embeds only the
faces the detector returned (src/main.cpp:226, one extractFeature per
detected face). Under XLA every shape is static, so "embed just the
valid ones" cannot live inside one compiled program; this module splits
the pipeline at its natural seam instead:

  program A (one per batch shape): detect → decode → NMS → align →
    warp, then compact the (B*K) crop slots valid-first with a stable
    argsort + one gather, and count n_valid;
  program B (one per size bucket): embed the first `bucket` compacted
    crops — a static shape — and scatter features back to their (B, K)
    slots (invalid slots zero, same contract as frames_to_features).

The driver speculates the bucket from the PREVIOUS step's count, so
program B is enqueued without waiting for n_valid to arrive on host —
the scalar fetch overlaps program B's device execution. An
underprediction is corrected exactly by re-running program B at the
right bucket (costs one extra embed on an occupancy spike, nothing in
steady state). Buckets are powers of two ≥ 32, so at most
log2(B*K/32)+2 embed programs ever compile.

Measured on TPU v5e (bench.py --config headline_occ_adaptive, batch 128,
2/8 occupancy): see docs/PERFORMANCE.md — the dense fused step pays the
full 1024-crop embed (~half the step) for 256 real faces; this path
embeds a 256-crop bucket.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch, embed_crops
from facerecognizeonnx_tpu.pipeline.fused import detect_topk
from facerecognizeonnx_tpu.types import Detections

MIN_BUCKET = 32  # smallest embed batch worth its own compile


def detect_and_compact(
    det_params,
    frames_u8: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int = 8,
    compute_dtype=None,
    valid_cap: int = None,
) -> Tuple[Detections, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Program A: frames → (dets, compacted crops, perm, valid, n_valid).

    crops_c is (B*K, S, S, 3) embed-ready crops reordered valid-first
    (stable: original slot order preserved within each class); perm is
    the (B*K,) permutation that produced it; n_valid the int32 count of
    occupied slots.
    """
    dets, top = detect_topk(
        det_params, frames_u8, cfg, max_faces_embed, compute_dtype, valid_cap
    )
    crops = align_faces_batch(
        frames_u8, top.kps, top.boxes, cfg,
        valid=top.valid if cfg.skip_invalid_faces else None,
        normalized=True,
    )
    b, k = crops.shape[0], crops.shape[1]
    valid_flat = top.valid.reshape(b * k)
    # argsort is stable: invalid (True under ~) sink to the back, valid
    # slots keep frame-major order at the front
    perm = jnp.argsort(~valid_flat)
    crops_c = crops.reshape((b * k,) + crops.shape[2:])[perm]
    n_valid = jnp.sum(valid_flat.astype(jnp.int32))
    return dets, crops_c, perm, valid_flat, n_valid


def embed_compacted(
    arc_params,
    crops_c: jnp.ndarray,
    perm: jnp.ndarray,
    valid_flat: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int,
    bucket: int,
    compute_dtype=None,
) -> jnp.ndarray:
    """Program B: embed crops_c[:bucket], scatter back → (B, K, D).

    Slots beyond the bucket and invalid slots carry zero features —
    identical contract to frames_to_features (zero features make misuse
    obvious: compareFaces gives (0+1)/2 = 0.5, src/face_recognizer.cpp:
    254-257 returns empty on failure).
    """
    total = valid_flat.shape[0]
    k = max_faces_embed
    feats_b = embed_crops(
        arc_params, crops_c[:bucket], cfg, compute_dtype, normalized=True
    )
    out = jnp.zeros((total, feats_b.shape[-1]), feats_b.dtype)
    out = out.at[perm[:bucket]].set(feats_b)
    out = out * valid_flat[:, None].astype(out.dtype)
    return out.reshape(total // k, k, -1)


def default_buckets(total: int) -> Tuple[int, ...]:
    """Powers of two from MIN_BUCKET up, capped (and terminated) at total."""
    out = []
    b = MIN_BUCKET
    while b < total:
        out.append(b)
        b *= 2
    out.append(total)
    return tuple(out)


class BucketedEmbedPipeline:
    """frames → (Detections, (B, K, D) features, n_valid) with embed
    cost proportional to the bucketed number of DETECTED faces.

    Drop-in for jit(frames_to_features) in steady-occupancy loops
    (webcam/video/serving). Exact: features of valid slots match
    frames_to_features bit-for-bit at the same compute dtype (same
    detect, same warp, same network — only the embed batch is packed);
    invalid slots are zeros in both.
    """

    def __init__(
        self,
        det_params,
        arc_params,
        cfg: PipelineConfig,
        max_faces_embed: int = 8,
        buckets: Optional[Sequence[int]] = None,
        valid_cap: int = None,
        compute_dtype=None,
    ):
        self.cfg = cfg
        self.k = max_faces_embed
        self._buckets = tuple(sorted(buckets)) if buckets else None
        self.corrections = 0  # underpredicted steps (extra embed ran)
        self._last_n: Optional[int] = None

        self._detect = jax.jit(
            lambda frames: detect_and_compact(
                det_params, frames, cfg, max_faces_embed, compute_dtype,
                valid_cap,
            )
        )
        self._embed_jit = {}

        def make_embed(bucket):
            return jax.jit(
                lambda c, p, v: embed_compacted(
                    arc_params, c, p, v, cfg, max_faces_embed, bucket,
                    compute_dtype,
                )
            )

        self._make_embed = make_embed

    def _pick(self, n: int, total: int) -> int:
        if n <= 0:
            return 0
        buckets = self._buckets or default_buckets(total)
        for b in buckets:
            if b >= n:
                return min(b, total)
        return total

    def _embed(self, bucket, crops_c, perm, valid_flat):
        fn = self._embed_jit.get(bucket)
        if fn is None:
            fn = self._embed_jit[bucket] = self._make_embed(bucket)
        return fn(crops_c, perm, valid_flat)

    def __call__(self, frames_u8):
        dets, crops_c, perm, valid_flat, n_valid = self._detect(frames_u8)
        total = int(valid_flat.shape[0])
        # speculate from the previous step's count (first step: assume
        # full) so program B enqueues before n_valid reaches the host
        guess = self._pick(
            self._last_n if self._last_n is not None else total, total
        )
        feats = None
        if guess > 0:
            feats = self._embed(guess, crops_c, perm, valid_flat)
        n = int(n_valid)  # host fetch overlaps program B on device
        self._last_n = n
        need = self._pick(n, total)
        if need > guess:  # underprediction: redo at the correct bucket
            self.corrections += 1
            feats = self._embed(need, crops_c, perm, valid_flat)
        if feats is None:  # guess == need == 0: no faces anywhere
            feats = jnp.zeros(
                (total // self.k, self.k, self.cfg.feature_dim),
                jnp.float32,
            )
        return dets, feats, n
