"""Face tracking + embedding cache for video streams.

The reference re-embeds EVERY face of EVERY frame (src/main.cpp:214-257
— "no tracking, batching, or caching", SURVEY.md §3.3). On a TPU the
embed dominates the fused step (~85 of 164 ms at batch 128), so a video
stream with stable faces wastes most of its device time recomputing
features it already has.

This module is the framework extension: an IOU tracker associates
detections across frames, each track carries a cached (momentum-
smoothed) feature, and only frames containing a NEW track or a track
due for refresh run the full detect+align+embed program — everything
else runs the detect-only program (~5x cheaper than fused at batch 128).
Labels (Match/Unknown vs the enrolled reference, threshold 0.6 on the
(cos+1)/2 scale — src/main.cpp:228-234) come from the track's cached
feature, so per-frame semantics match the reference's loop whenever the
cache is fresh.

Host-side logic is numpy-only; both device programs are jitted once at
a fixed micro-batch size (pad-by-repeat keeps shapes static).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) [x1,y1,x2,y2] → (N, M) IoU with the reference's
    +1 width convention (face_detector.cpp:340-354): w = x2-x1+1. This
    is not just parity cosmetics — degenerate boxes (x2==x1, which
    sub-pixel detections can produce) keep area 1 instead of 0, so an
    IDENTICAL degenerate box re-detected next frame still matches its
    track at IoU 1.0 rather than 0/0."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)

    def canon(x):
        # inverted corners (x2<x1) would zero their own area and never
        # self-match; association treats a box as its corner hull
        return np.concatenate(
            [np.minimum(x[:, :2], x[:, 2:]), np.maximum(x[:, :2], x[:, 2:])],
            axis=1,
        )

    a, b = canon(np.asarray(a, np.float32)), canon(np.asarray(b, np.float32))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]

    def area(x):
        return np.clip(x[:, 2] - x[:, 0] + 1.0, 0, None) * np.clip(
            x[:, 3] - x[:, 1] + 1.0, 0, None
        )

    union = area(a)[:, None] + area(b)[None, :] - inter
    return (inter / np.maximum(union, 1e-9)).astype(np.float32)


@dataclass
class Track:
    track_id: int
    box: np.ndarray  # (4,) letterboxed px
    score: float
    feature: Optional[np.ndarray] = None  # (512,) L2-normalized, cached
    hits: int = 1
    misses: int = 0
    frames_since_embed: int = 0  # counts from the last feature update
    label: str = ""
    label_dirty: bool = False  # feature changed since the last 1:N label

    def needs_embed(self, refresh_every: int) -> bool:
        return self.feature is None or self.frames_since_embed >= refresh_every


@dataclass
class IOUTracker:
    """Greedy IOU association (highest-IoU pairs first), standard
    IoU-tracker semantics: unmatched detections open tracks, tracks
    missing for > max_misses frames close."""

    iou_threshold: float = 0.3
    max_misses: int = 5
    _next_id: int = 0
    tracks: List[Track] = field(default_factory=list)

    def update(self, boxes: np.ndarray, scores: np.ndarray) -> List[Track]:
        """boxes (N, 4) / scores (N,) for ONE frame's valid detections →
        the Track object for each detection row (same order)."""
        n = len(boxes)
        ious = iou_matrix(
            np.stack([t.box for t in self.tracks]) if self.tracks else
            np.zeros((0, 4), np.float32),
            boxes,
        )
        matched_det = [None] * n
        used_t, used_d = set(), set()
        order = np.dstack(np.unravel_index(np.argsort(-ious, axis=None), ious.shape))
        for ti, di in order.reshape(-1, 2):
            if ious[ti, di] < self.iou_threshold:
                break
            if ti in used_t or di in used_d:
                continue
            used_t.add(int(ti))
            used_d.add(int(di))
            t = self.tracks[ti]
            t.box = boxes[di].copy()
            t.score = float(scores[di])
            t.hits += 1
            t.misses = 0
            t.frames_since_embed += 1
            matched_det[di] = t
        for di in range(n):
            if matched_det[di] is None:
                t = Track(self._next_id, boxes[di].copy(), float(scores[di]))
                self._next_id += 1
                self.tracks.append(t)
                matched_det[di] = t
        for ti, t in enumerate(self.tracks):
            if ti not in used_t and matched_det.count(t) == 0:
                t.misses += 1
        self.tracks = [t for t in self.tracks if t.misses <= self.max_misses]
        return matched_det


class TrackingVideoPipeline:
    """Video stream with per-track embedding cache.

    Per micro-batch of letterboxed frames:
      1. detect-only device program (detect_batch_program)
      2. host IOU tracker assigns detections to tracks
      3. frames holding a track that needs_embed() re-run through the
         FUSED program (same weights → identical detections, so feats
         align with the detect-only slots by index); track features
         update with momentum
      4. labels from cached track features vs the enrolled reference

    stats() reports embed_frames/total_frames — the fraction of device
    work the cache saved is ~(1 - ratio) * embed_share_of_fused.
    """

    def __init__(
        self,
        det_params,
        arc_params,
        cfg=None,
        batch: int = 4,
        max_faces_embed: int = 8,
        refresh_every: int = 32,
        iou_threshold: float = 0.3,
        max_misses: int = 5,
        feat_momentum: float = 0.9,
        adaptive_embed: bool = False,
    ):
        """adaptive_embed=True runs the refresh frames through the
        occupancy-adaptive bucketed pipeline (pipeline/bucketed.py)
        instead of the dense fused program. Refresh frames are EXACTLY
        the low-occupancy case the bucketed path exists for: a refresh
        batch typically carries 1-2 stale tracks out of K=8 slots, so
        the dense program would pay batch*K embeds for a handful of
        faces. Features (and hence labels) match the dense refresh
        within float tolerance (tests/test_track.py)."""
        import jax

        from facerecognizeonnx_tpu.config import PipelineConfig
        from facerecognizeonnx_tpu.detect.pipeline import detect_batch_program
        from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

        self.cfg = cfg or PipelineConfig()
        self.batch = batch
        self.k = max_faces_embed
        self.refresh_every = refresh_every
        self.momentum = feat_momentum
        self.tracker = IOUTracker(iou_threshold=iou_threshold, max_misses=max_misses)
        self._detect = jax.jit(
            lambda frames: detect_batch_program(det_params, frames, self.cfg)
        )
        if adaptive_embed:
            from facerecognizeonnx_tpu.pipeline.bucketed import (
                BucketedEmbedPipeline,
            )

            self.bucketed = BucketedEmbedPipeline(
                det_params, arc_params, self.cfg, max_faces_embed
            )

            def embed_feats(frames, n_real):
                return self.bucketed.finish(
                    self.bucketed.start(frames, n_frames=n_real)
                )[1]

            self._embed_feats = embed_feats
        else:
            self.bucketed = None
            fused = jax.jit(
                lambda frames: frames_to_features(
                    det_params, arc_params, frames, self.cfg, max_faces_embed
                )
            )
            self._embed_feats = lambda frames, n_real: fused(frames)[1]
        self.total_frames = 0
        self.embed_frames = 0

    # ------------------------------------------------------------- internals

    def _letterboxed(self, frame_iter) -> Iterator:
        import jax.numpy as jnp

        from facerecognizeonnx_tpu.ops.image import letterbox

        size = self.cfg.det_input_size
        for frame in frame_iter:
            padded, scale = letterbox(jnp.asarray(frame), size)
            yield np.asarray(padded, np.uint8), float(scale)

    def _update_feature(self, track: Track, feat: np.ndarray):
        feat = np.asarray(feat, np.float32)
        norm = np.linalg.norm(feat)
        if norm <= 0:
            return
        feat = feat / norm
        if track.feature is None:
            track.feature = feat
        else:
            mixed = self.momentum * track.feature + (1.0 - self.momentum) * feat
            track.feature = mixed / max(np.linalg.norm(mixed), 1e-9)
        track.frames_since_embed = 0
        track.label_dirty = True

    # ------------------------------------------------------------------ run

    def run(
        self,
        frame_iter,
        ref_feature: Optional[np.ndarray] = None,
        match_threshold: Optional[float] = None,
        bank=None,
    ):
        """Yields (frame_idx, dets_dict, tracks) per frame, where
        dets_dict has numpy boxes/scores/kps/valid (top-K slots, original
        -frame px) and tracks is the per-slot list of Track (None on
        invalid slots).

        Labeling: `bank` (a match.gallery.GalleryBank) labels each track
        with its 1:N top-1 identity at the match threshold — one batched
        search per micro-batch, re-run only for tracks whose cached
        feature changed (label_dirty). Without a bank, `ref_feature`
        gives the reference's webcam Match/Unknown semantics
        (src/main.cpp:228-234). bank wins if both are passed."""
        import jax
        import jax.numpy as jnp

        thr = self.cfg.match_threshold if match_threshold is None else match_threshold
        buf, scales = [], []
        n_out = 0

        def flush():
            nonlocal n_out
            if not buf:
                return
            n = len(buf)
            frames = np.stack(buf + [buf[-1]] * (self.batch - n))
            dev = jnp.asarray(frames)
            dets = jax.tree_util.tree_map(np.asarray, self._detect(dev))
            k = self.k
            # host tracking pass over the real frames of this batch
            per_frame_tracks: List[List[Optional[Track]]] = []
            need_embed = []
            for i in range(n):
                valid = dets.valid[i, :k]
                idx = np.nonzero(valid)[0]
                assigned = self.tracker.update(
                    dets.boxes[i, :k][idx], dets.scores[i, :k][idx]
                )
                slots: List[Optional[Track]] = [None] * k
                for j, det_slot in enumerate(idx):
                    slots[int(det_slot)] = assigned[j]
                per_frame_tracks.append(slots)
                if any(
                    t is not None and t.needs_embed(self.refresh_every)
                    for t in slots
                ):
                    need_embed.append(i)
            # fused re-run ONLY for frames with stale/new tracks (the
            # adaptive path embeds just those frames' DETECTED faces;
            # pad-by-repeat rows are excluded from its speculation)
            if need_embed:
                sel = need_embed + [need_embed[-1]] * (self.batch - len(need_embed))
                feats = self._embed_feats(
                    dev[np.asarray(sel)], len(need_embed)
                )
                feats = np.asarray(feats)
                for row, i in enumerate(need_embed):
                    for slot, t in enumerate(per_frame_tracks[i]):
                        if t is not None and t.needs_embed(self.refresh_every):
                            self._update_feature(t, feats[row, slot])
                self.embed_frames += len(need_embed)
            self.total_frames += n
            # labels: ONE batched 1:N search for every refreshed track
            if bank is not None and len(bank):
                fresh, seen = [], set()
                for slots in per_frame_tracks:
                    for t in slots:
                        if (
                            t is not None and t.label_dirty
                            and t.feature is not None and id(t) not in seen
                        ):
                            seen.add(id(t))
                            fresh.append(t)
                if fresh:
                    top_names, top_sims = bank.search(
                        np.stack([t.feature for t in fresh]), top_k=1
                    )
                    for t, nm, sm in zip(fresh, top_names, top_sims):
                        sim = float(sm[0])
                        t.label = nm[0] if sim > thr else "Unknown"
                        t.label_dirty = False
            for i in range(n):
                scale = scales[i]
                for t in per_frame_tracks[i]:
                    if t is None:
                        continue
                    if bank is not None:
                        if t.feature is None:
                            t.label = "Unknown"
                        continue
                    if ref_feature is None:
                        continue
                    if t.feature is None:
                        t.label = "Unknown"
                        continue
                    sim = float((t.feature @ ref_feature + 1.0) / 2.0)
                    t.label = "Match" if sim > thr else "Unknown"
                out = {
                    "boxes": dets.boxes[i, :k] / scale,
                    "scores": dets.scores[i, :k],
                    "kps": dets.kps[i, :k] / scale,
                    "valid": dets.valid[i, :k],
                }
                yield n_out, out, per_frame_tracks[i]
                n_out += 1
            buf.clear()
            scales.clear()

        for frame, scale in self._letterboxed(frame_iter):
            buf.append(frame)
            scales.append(scale)
            if len(buf) == self.batch:
                yield from flush()
        yield from flush()

    def stats(self):
        out = {
            "total_frames": self.total_frames,
            "embed_frames": self.embed_frames,
            "embed_fraction": (
                self.embed_frames / self.total_frames if self.total_frames else 0.0
            ),
            "active_tracks": len(self.tracker.tracks),
        }
        if self.bucketed is not None:
            out["embed_bucket"] = self.bucketed.last_bucket
            out["embed_corrections"] = self.bucketed.corrections
        return out
