"""Streaming video pipeline: prefetch → micro-batch → fused TPU program.

The reference's webcam loop is fully serial — capture, detect, embed,
draw, one frame at a time (src/main.cpp:214-257). The TPU-native version
pipelines three stages:

  host:   PrefetchLoader thread (native C++ letterbox) fills a frame ring
  device: detect+align+embed for a MICRO-BATCH of frames in one program
          (pipeline/fused.frames_to_features)
  host:   match each face against the enrolled reference feature

Matching semantics preserved: (cos+1)/2 vs 0.6 → "Match"/"Unknown"
(src/main.cpp:228-234).
"""

from __future__ import annotations

import time
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
from facerecognizeonnx_tpu.types import Detections
from facerecognizeonnx_tpu.utils.observability import Counter


class VideoPipeline:
    def __init__(
        self,
        det_params,
        arc_params,
        cfg: PipelineConfig = PipelineConfig(),
        batch: int = 4,
        max_faces_embed: int = 8,
        adaptive_embed: bool = False,
    ):
        """adaptive_embed=True swaps the dense fused program for the
        occupancy-adaptive bucketed pipeline (pipeline/bucketed.py):
        embed cost tracks the number of DETECTED faces instead of
        paying all K slots every micro-batch — the right choice for
        real streams, where most of the K=8 slots are empty (the
        reference embeds only detected faces, src/main.cpp:226).
        Features match the dense program within float tolerance
        (tests/test_bucketed.py). The bucketed two-phase API keeps the
        double-buffering overlap below intact: its host count fetch
        happens at materialize time, after the next batch's programs
        were dispatched; pad-by-repeat frames in a partial final batch
        are excluded from its occupancy speculation."""
        self.cfg = cfg
        self.batch = batch
        self.max_faces_embed = max_faces_embed
        if adaptive_embed:
            from facerecognizeonnx_tpu.pipeline.bucketed import (
                BucketedEmbedPipeline,
            )

            bucketed = BucketedEmbedPipeline(
                det_params, arc_params, cfg, max_faces_embed
            )
            self._start = lambda frames, n_real: bucketed.start(
                frames, n_frames=n_real
            )
            self._finish = lambda pend: bucketed.finish(pend)[:2]
        else:
            program = jax.jit(
                lambda frames: frames_to_features(
                    det_params, arc_params, frames, cfg, max_faces_embed
                )
            )
            self._start = lambda frames, n_real: program(frames)
            self._finish = lambda out: out
        self.counter = Counter("frames")

    def _letterboxed_frames(self, frame_iter) -> Iterator:
        size = self.cfg.det_input_size
        try:
            from facerecognizeonnx_tpu.runtime.native import (
                PrefetchLoader,
                native_available,
            )

            if native_available():
                yield from PrefetchLoader(frame_iter, size, 2 * self.batch).frames()
                return
        except Exception:
            pass
        from facerecognizeonnx_tpu.ops.image import letterbox

        for frame in frame_iter:  # python fallback
            padded, scale = letterbox(jnp.asarray(frame), size)
            yield np.asarray(padded, np.uint8), scale

    def run(
        self,
        frame_iter,
        ref_feature: Optional[np.ndarray] = None,
        max_frames: Optional[int] = None,
        match_threshold: Optional[float] = None,
    ):
        """Yields (frame_idx, Detections, features (K,512), labels) per frame."""
        thr = (
            self.cfg.match_threshold if match_threshold is None else match_threshold
        )
        buf: List[np.ndarray] = []
        scales: List[float] = []
        n_out = 0
        # Double buffering: the device program for micro-batch N+1 is
        # dispatched BEFORE batch N's results are materialized to host,
        # so TPU compute overlaps host-side postprocess/labeling (the
        # device-level analog of the PrefetchLoader's host thread).
        # The adaptive path's host sync + exact correction live in
        # _finish, called at materialize time — dispatch stays sync-free.
        pending = None  # (start() handle, batch_len, scales)

        def dispatch():
            nonlocal pending
            if not buf:
                return None
            frames = np.stack(buf + [buf[-1]] * (self.batch - len(buf)))
            with self.counter.event(items=len(buf)):
                out = self._start(jnp.asarray(frames), len(buf))
            prev, pending = pending, (out, len(buf), list(scales))
            buf.clear()
            scales.clear()
            return prev

        def materialize(entry):
            nonlocal n_out
            if entry is None:
                return
            handle, n, batch_scales = entry
            dets, feats = self._finish(handle)
            feats = np.asarray(feats)
            dets = jax.tree_util.tree_map(np.asarray, dets)
            for i in range(n):
                det_i = Detections(
                    boxes=dets.boxes[i] / batch_scales[i],
                    scores=dets.scores[i],
                    kps=dets.kps[i] / batch_scales[i],
                    valid=dets.valid[i],
                )
                labels = []
                if ref_feature is not None:
                    for k in range(self.max_faces_embed):
                        if not det_i.valid[k]:
                            labels.append("")
                            continue
                        sim = float((feats[i, k] @ ref_feature + 1.0) / 2.0)
                        labels.append("Match" if sim > thr else "Unknown")
                yield (n_out, det_i, feats[i], labels)
                n_out += 1

        stop = False
        for frame, scale in self._letterboxed_frames(frame_iter):
            buf.append(frame)
            scales.append(scale)
            if len(buf) == self.batch:
                yield from materialize(dispatch())
            if max_frames is not None and n_out + len(buf) + (
                pending[1] if pending else 0
            ) >= max_frames:
                stop = True
                break
        if not stop or buf:
            yield from materialize(dispatch())
        yield from materialize(pending)
        pending = None

    def stats(self):
        return self.counter.summary()
