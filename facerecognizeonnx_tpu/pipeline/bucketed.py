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
    argsort + one gather, and count the occupied slots per frame;
  program B (one per size bucket): embed the first `bucket` compacted
    crops — a static shape — and scatter features back to their (B, K)
    slots (invalid slots zero, same contract as frames_to_features).
    With `search_top_k` set, program B ALSO fuses the gallery top-k
    (the adaptive form of pipeline/fused.frames_to_matches), so
    serve-shaped identify keeps its one-extra-dispatch budget.

The driver speculates the bucket from the PREVIOUS step's per-frame
occupancy rate, so program B is enqueued without waiting for the counts
to arrive on host — the host fetch overlaps program B's device
execution. An underprediction is corrected exactly by re-running
program B at the right bucket (costs one extra embed on an occupancy
spike, nothing in steady state). Buckets are powers of two ≥ 32, so at
most log2(B*K/32)+2 embed programs ever compile.

The two-phase start()/finish() API preserves double buffering:
start(batch N+1) dispatches both device programs with NO host sync, so
a caller can materialize batch N's results while N+1 runs
(pipeline/video.py, pipeline/service.py). finish() then pays the
(overlapped) host fetch and the exact correction if the speculation
was short.

With `mesh`, both programs run SPMD over the mesh's data axis
(shard_map): each shard compacts and embeds ITS OWN frames' crops, the
bucket is sized by the most-occupied shard, and the gallery bank (fused
search) is replicated — no collectives on the forward path, the same
scaling story as parallel/sharded_ops.make_dp_program.

Measured on TPU v5e (bench.py --config headline_occ_adaptive, batch 128,
2/8 occupancy): see docs/PERFORMANCE.md — the dense fused step pays the
full 1024-crop embed (~half the step) for 256 real faces; this path
embeds a 256-crop bucket.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
    """Program A: frames → (dets, compacted crops, perm, valid, counts).

    crops_c is (B*K, S, S, 3) embed-ready crops reordered valid-first
    (stable: original slot order preserved within each class); perm is
    the (B*K,) permutation that produced it; counts the (B,) int32
    per-frame occupied-slot counts (sum = total valid crops).

    Per-frame counts let a caller whose batch carries PADDED trailing
    frames (video/service partial batches pad by repeating the last
    frame) exclude the pads from occupancy statistics: pads are stacked
    LAST, and the stable frame-major compaction keeps every real
    frame's crop ahead of every pad frame's crop, so embedding the
    first sum(counts[:n_real]) compacted crops covers every real face.
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
    counts = jnp.sum(top.valid.astype(jnp.int32), axis=1)
    return dets, crops_c, perm, valid_flat, counts


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

    CALLER CONTRACT: `bucket` is a static Python int and must cover
    every valid crop the caller cares about (bucket ≥ the compacted
    count of those crops) — valid crops beyond the bucket silently get
    zero features. BucketedEmbedPipeline guarantees this by exact
    correction; direct callers must size the bucket themselves.
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


def embed_compacted_matches(
    arc_params,
    crops_c: jnp.ndarray,
    perm: jnp.ndarray,
    valid_flat: jnp.ndarray,
    bank_padded: jnp.ndarray,
    n_rows: jnp.ndarray,
    cfg: PipelineConfig,
    max_faces_embed: int,
    bucket: int,
    top_k: int,
    compute_dtype=None,
):
    """Program B with the gallery top-k FUSED in — the occupancy-
    adaptive form of pipeline/fused.frames_to_matches: embed the
    bucket, scatter back, one (B*K, D) x (D, Gpad) similarity matmul on
    the (cos+1)/2 scale, rows ≥ n_rows masked to −1, lax.top_k.

    Returns (feats (B, K, D), sims (B, K, top_k), idx (B, K, top_k)).
    Same consumer contract as frames_to_matches: only VALID face slots
    are meaningful (invalid/beyond-bucket slots carry zero features,
    whose sims are uniformly 0.5 against every real row — dropped by
    the valid mask exactly as on the dense path).
    """
    from facerecognizeonnx_tpu.match.similarity import similarity_matrix

    feats = embed_compacted(
        arc_params, crops_c, perm, valid_flat, cfg, max_faces_embed,
        bucket, compute_dtype,
    )
    b, k, d = feats.shape
    sims = similarity_matrix(feats.reshape(b * k, d), bank_padded)
    mask = jnp.arange(bank_padded.shape[0])[None, :] < n_rows
    sims = jnp.where(mask, sims, -1.0)
    v, i = jax.lax.top_k(sims, top_k)
    return feats, v.reshape(b, k, top_k), i.reshape(b, k, top_k)


def default_buckets(total: int) -> Tuple[int, ...]:
    """Powers of two from MIN_BUCKET up, capped (and terminated) at total."""
    out = []
    b = MIN_BUCKET
    while b < total:
        out.append(b)
        b *= 2
    out.append(total)
    return tuple(out)


@dataclass
class _Pending:
    """In-flight batch: device refs from start(), resolved by finish()."""

    dets: Any
    counts: Any  # device (B,) int32 per-frame valid counts
    feats: Any  # device (B, K, D) speculative features, or None
    matches: Any  # (sims, idx) device pair when search fused, or None
    guess: int  # speculated per-shard bucket (0 = no embed dispatched)
    n_frames: int  # real (non-pad) leading frames in the batch
    bank: Any  # (bank_padded, n_rows) when search fused, else None
    ops: Any  # (crops_c, perm, valid_flat) device refs for the correction


class BucketedEmbedPipeline:
    """frames → (Detections, (B, K, D) features[, sims, idx], n_valid)
    with embed cost proportional to the bucketed number of DETECTED
    faces.

    Drop-in for jit(frames_to_features) in steady-occupancy loops
    (webcam/video/serving). Exact in the only sense that matters:
    features of valid slots are numerically identical to
    frames_to_features within float tolerance (verified to 1e-5 in
    tests/test_bucketed.py — same detect, same warp, same network; the
    packed embed batch may let XLA pick different fusions, so bitwise
    equality is not claimed); invalid slots are zeros in both.

    search_top_k fuses the gallery top-k into program B (see
    embed_compacted_matches); __call__/start then take
    (frames, bank_padded, n_rows) — the padded device bank from
    GalleryBank.device_bank_padded.

    mesh runs both programs SPMD over `mesh_axis` (see module
    docstring); params are placed once at construction (replicated —
    weights, like make_dp_program), and frames are device_put sharded
    per call.

    start()/finish() split the dispatch from the host sync so callers
    can overlap batch N's materialization with batch N+1's device
    execution; __call__ = finish(start(...)).
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
        search_top_k: Optional[int] = None,
        mesh=None,
        mesh_axis: str = "data",
    ):
        self.cfg = cfg
        self.k = max_faces_embed
        self._buckets = tuple(sorted(buckets)) if buckets else None
        self.search_top_k = search_top_k
        self.mesh = mesh
        self.corrections = 0  # speculative embeds discarded (underpredictions)
        self.steps = 0
        self.last_bucket = 0  # most recent per-shard embed bucket (observability)
        self._last_rate: Optional[float] = None  # valid faces per REAL frame

        if mesh is None:
            self._n_shards = 1
            self._detect = jax.jit(
                lambda frames: detect_and_compact(
                    det_params, frames, cfg, max_faces_embed, compute_dtype,
                    valid_cap,
                )
            )

            def make_embed(bucket):
                if search_top_k is None:
                    return jax.jit(
                        lambda c, p, v: embed_compacted(
                            arc_params, c, p, v, cfg, max_faces_embed,
                            bucket, compute_dtype,
                        )
                    )
                return jax.jit(
                    lambda c, p, v, bank, n: embed_compacted_matches(
                        arc_params, c, p, v, bank, n, cfg, max_faces_embed,
                        bucket, search_top_k, compute_dtype,
                    )
                )

        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from facerecognizeonnx_tpu.parallel.sharded_ops import (
                pack_recognizer,
                shard_map,
            )

            self._n_shards = mesh.shape[mesh_axis]
            ap_tree, rebuild = pack_recognizer(arc_params)
            repl = NamedSharding(mesh, P())
            det_repl = jax.device_put(det_params, repl)
            ap_repl = jax.device_put(ap_tree, repl)
            sh = P(mesh_axis)
            self._in_sharding = NamedSharding(mesh, sh)
            dets_sh = Detections(boxes=sh, scores=sh, kps=sh, valid=sh)

            det_fn = jax.jit(
                shard_map(
                    lambda dp, v: detect_and_compact(
                        dp, v, cfg, max_faces_embed, compute_dtype, valid_cap
                    ),
                    mesh=mesh,
                    in_specs=(P(), sh),
                    out_specs=(dets_sh, sh, sh, sh, sh),
                    check_rep=False,  # Pallas warp carries no vma info
                )
            )
            self._detect = lambda frames: det_fn(det_repl, frames)

            def make_embed(bucket):
                if search_top_k is None:
                    fn = jax.jit(
                        shard_map(
                            lambda ap, c, p, v: embed_compacted(
                                rebuild(ap), c, p, v, cfg, max_faces_embed,
                                bucket, compute_dtype,
                            ),
                            mesh=mesh,
                            in_specs=(P(), sh, sh, sh),
                            out_specs=sh,
                            check_rep=False,
                        )
                    )
                    return lambda c, p, v: fn(ap_repl, c, p, v)
                fn = jax.jit(
                    shard_map(
                        lambda ap, c, p, v, bank, n: embed_compacted_matches(
                            rebuild(ap), c, p, v, bank, n, cfg,
                            max_faces_embed, bucket, search_top_k,
                            compute_dtype,
                        ),
                        mesh=mesh,
                        in_specs=(P(), sh, sh, sh, P(), P()),
                        out_specs=(sh, sh, sh),
                        check_rep=False,
                    )
                )
                return lambda c, p, v, bank, n: fn(ap_repl, c, p, v, bank, n)

        self._make_embed = make_embed
        self._embed_jit = {}

    def _pick(self, n: int, total: int) -> int:
        if n <= 0:
            return 0
        buckets = self._buckets or default_buckets(total)
        for b in buckets:
            if b >= n:
                return min(b, total)
        return total

    def _embed(self, bucket, *operands):
        fn = self._embed_jit.get(bucket)
        if fn is None:
            fn = self._embed_jit[bucket] = self._make_embed(bucket)
        return fn(*operands)

    # ------------------------------------------------------------ two-phase

    def start(
        self,
        frames_u8,
        n_frames: Optional[int] = None,
        bank_padded=None,
        n_rows=None,
    ) -> _Pending:
        """Dispatch program A + the speculative program B with NO host
        sync. n_frames: how many leading frames are REAL (the rest are
        pad-by-repeat copies, excluded from occupancy statistics).
        bank_padded/n_rows are required iff search_top_k was set."""
        if (bank_padded is None) != (self.search_top_k is None) or (
            self.search_top_k is not None and n_rows is None
        ):
            raise ValueError(
                "bank_padded AND n_rows must be passed exactly when the "
                "pipeline was built with search_top_k"
            )
        if self.mesh is not None:
            frames_u8 = jax.device_put(np.asarray(frames_u8), self._in_sharding)
        dets, crops_c, perm, valid_flat, counts = self._detect(frames_u8)
        b = int(counts.shape[0])
        local_b = b // self._n_shards
        local_total = local_b * self.k
        n_frames = b if n_frames is None else n_frames
        # speculate from the previous step's real-frame occupancy rate
        # (first step: assume full occupancy)
        if self._last_rate is None:
            guess = self._pick(local_total, local_total)
        else:
            guess = self._pick(
                int(math.ceil(self._last_rate * local_b)), local_total
            )
        feats = matches = None
        bank = None
        if self.search_top_k is not None:
            n_rows = jnp.int32(n_rows)
            bank = (bank_padded, n_rows)
        if guess > 0:
            if bank is None:
                feats = self._embed(guess, crops_c, perm, valid_flat)
            else:
                feats, sims, idx = self._embed(
                    guess, crops_c, perm, valid_flat, bank_padded, n_rows
                )
                matches = (sims, idx)
        return _Pending(
            dets, counts, feats, matches, guess, n_frames, bank,
            (crops_c, perm, valid_flat),
        )

    def finish(self, pend: _Pending):
        """Host-fetch the counts (overlaps program B on device), correct
        an underprediction exactly, return the batch results:
        (dets, feats, n_valid) — or (dets, feats, sims, idx, n_valid)
        when the gallery search is fused. n_valid counts REAL frames'
        occupied slots only (pads excluded)."""
        counts = np.asarray(pend.counts)  # host fetch overlaps program B
        b = counts.shape[0]
        local_b = b // self._n_shards
        local_total = local_b * self.k
        real = counts.copy()
        real[pend.n_frames:] = 0  # pad frames don't count
        n = int(real.sum())
        self.steps += 1
        self._last_rate = n / max(1, pend.n_frames)
        # per-shard correction basis: each shard embeds its own first
        # `bucket` compacted crops, so the bucket must cover the MOST
        # occupied shard's real crops (pads stack last within the last
        # shard, behind its real frames' crops — see detect_and_compact)
        per_shard = real.reshape(self._n_shards, local_b).sum(axis=1)
        need = self._pick(int(per_shard.max()), local_total)
        feats, matches = pend.feats, pend.matches
        if need > pend.guess:  # underprediction: redo at the correct bucket
            if pend.guess > 0:
                self.corrections += 1  # a speculative embed was discarded
            crops_c, perm, valid_flat = pend.ops
            if pend.bank is None:
                feats = self._embed(need, crops_c, perm, valid_flat)
            else:
                feats, sims, idx = self._embed(
                    need, crops_c, perm, valid_flat, *pend.bank
                )
                matches = (sims, idx)
            self.last_bucket = need
        else:
            self.last_bucket = max(need, pend.guess) if pend.guess else need
        if feats is None:  # guess == need == 0: no faces anywhere
            feats = jnp.zeros((b, self.k, self.cfg.feature_dim), jnp.float32)
            if pend.bank is not None:
                matches = (
                    jnp.zeros((b, self.k, self.search_top_k), jnp.float32),
                    jnp.zeros((b, self.k, self.search_top_k), jnp.int32),
                )
        if pend.bank is not None:
            return pend.dets, feats, matches[0], matches[1], n
        return pend.dets, feats, n

    def __call__(self, frames_u8, bank_padded=None, n_rows=None):
        return self.finish(
            self.start(frames_u8, bank_padded=bank_padded, n_rows=n_rows)
        )
