"""Micro-batching identification service (production serving surface).

Concurrent callers submit frames; a worker thread coalesces requests
into device micro-batches (host letterbox → ONE fused
detect+align+embed program → gallery search) and resolves futures. This
is the serving-shaped wrapper over the same programs the CLI uses —
the reference has no serving story at all (single-threaded CLI loop,
src/main.cpp:214-257).

Latency/throughput knobs: max_batch (device batch), batch_window_ms
(how long to wait for co-riders before dispatching a partial batch).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.match.gallery import GalleryBank
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features


@dataclass
class IdentifyResult:
    boxes: np.ndarray  # (K, 4) original-image pixels
    scores: np.ndarray  # (K,)
    valid: np.ndarray  # (K,) bool
    names: List[List[str]]  # per valid face slot
    sims: np.ndarray  # (K, top_k)


@dataclass
class _Request:
    image: np.ndarray
    top_k: int
    future: Future = field(default_factory=Future)
    t_enqueue: float = 0.0


class IdentifyService:
    def __init__(
        self,
        det_params,
        arc_params,
        bank: GalleryBank,
        cfg: PipelineConfig = PipelineConfig(),
        max_batch: int = 8,
        batch_window_ms: float = 5.0,
        max_faces: int = 8,
        sharded: bool = False,
        aot=None,
        mesh=None,
        mesh_axis: str = "data",
        fuse_search: bool = False,
        search_top_k: int = 5,
        adaptive_embed: bool = False,
        valid_cap: int = None,
    ):
        """aot: a pipeline.aot.AotPipeline (or .frtz path) to use as the
        fused program instead of tracing det_params/arc_params — the
        deployed artifact is then version-pinned and identical across
        serving processes. Its baked batch/config override max_batch,
        max_faces, and cfg (they must be consistent by construction).

        mesh: a jax.sharding.Mesh (or device count) for DATA-PARALLEL
        serving — each micro-batch is sharded over the mesh's
        `mesh_axis` and every chip runs the fused program on its shard
        (parallel/sharded_ops.make_dp_program; params replicated once at
        construction). max_batch is rounded up to a multiple of the axis
        size so every dispatch shards evenly. Composes with
        sharded=True, which spreads the GALLERY rows over the same
        devices — batch axis and gallery axis scale independently.
        Mutually exclusive with aot (bundles are single-device
        programs).

        fuse_search: ONE-dispatch identify — the gallery top-k fuses
        into the detect→align→embed program (frames_to_matches), so a
        request costs one host↔device round trip instead of two (the
        win is the round trip itself: ~25 ms on a tunneled host vs
        ~2.5 ms of device work). The gallery ships to the device
        zero-padded to a power-of-two bucket; enrolls within a bucket
        reuse the compiled program, bucket growth recompiles.
        search_top_k is the baked program width; a request asking for
        MORE matches than that is honored through the host-side gallery
        search instead (it alone pays the second dispatch — never
        silently fewer results than default serving). Composes with
        mesh (dp + fused search in one SPMD
        program, bank replicated); exclusive with sharded (which
        spreads gallery rows instead) and aot (bundles bake the
        feature program only).

        adaptive_embed: serve through the occupancy-adaptive bucketed
        pipeline (pipeline/bucketed.py, `serve --adaptive-embed`)
        instead of the dense fused program: the embed stage packs the
        DETECTED faces of the micro-batch into a power-of-two bucket
        sized by recent occupancy, so serving cost tracks real faces
        instead of paying all max_faces slots per frame — 1.7x+ at the
        production 2/8 occupancy point (docs/PERFORMANCE.md). Results
        are identical to the dense service within float tolerance
        (tests/test_service.py parity). Composes with fuse_search (the
        gallery top-k fuses into the bucketed embed program), with mesh
        (both programs run SPMD over the data axis), and with sharded
        (host-side row-sharded search); exclusive with aot (bundles
        bake the dense program). Pad-by-repeat frames in a partial
        micro-batch are excluded from its occupancy speculation.

        valid_cap: BENCHMARK control (see pipeline/fused.detect_topk) —
        forces per-frame embed-slot occupancy so synthetic load tests
        measure a known operating point. Leave None in production;
        unsupported with aot."""
        if fuse_search and (sharded or aot is not None):
            raise ValueError(
                "fuse_search composes with mesh dp, but not with "
                "sharded gallery rows or aot bundles (those keep the "
                "two-dispatch path)"
            )
        if aot is not None and mesh is not None:
            raise ValueError(
                "aot and mesh are mutually exclusive: .frtz bundles are "
                "single-device programs (export per-chip and load-balance "
                "above the service instead)"
            )
        if aot is not None and (adaptive_embed or valid_cap is not None):
            raise ValueError(
                "adaptive_embed/valid_cap need traced programs; .frtz "
                "bundles bake the dense program (re-export without aot)"
            )
        if isinstance(aot, str):
            from facerecognizeonnx_tpu.pipeline.aot import load_bundle

            aot = load_bundle(aot)
        if aot is not None:
            cfg = aot.config
            max_batch = aot.batch
            max_faces = aot.max_faces_embed
        if mesh is not None and not hasattr(mesh, "shape"):
            from facerecognizeonnx_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(
                (mesh_axis,), devices=jax.devices()[: int(mesh)]
            )
        if mesh is not None:
            n = mesh.shape[mesh_axis]
            max_batch = -(-max_batch // n) * n
        self.cfg = cfg
        self.bank = bank
        self.sharded = sharded  # shard gallery rows over the device mesh
        self.max_batch = max_batch
        self.window_s = batch_window_ms / 1e3
        self.max_faces = max_faces
        self.mesh = mesh
        self.fuse_search = fuse_search
        self.search_top_k = search_top_k
        self.adaptive = adaptive_embed
        # the replicated-bank device sharding for the fused search (the
        # padded bank caches per (bucket, sharding) in the store)
        self._bank_sharding = None
        if adaptive_embed:
            from facerecognizeonnx_tpu.pipeline.bucketed import (
                BucketedEmbedPipeline,
            )

            if mesh is not None and fuse_search:
                from jax.sharding import NamedSharding, PartitionSpec

                self._bank_sharding = NamedSharding(mesh, PartitionSpec())
            self._bucketed = BucketedEmbedPipeline(
                det_params, arc_params, cfg,
                max_faces_embed=max_faces,
                valid_cap=valid_cap,
                search_top_k=search_top_k if fuse_search else None,
                mesh=mesh, mesh_axis=mesh_axis,
            )
        elif mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from facerecognizeonnx_tpu.parallel.sharded_ops import (
                make_dp_program,
            )

            if valid_cap is not None:
                raise ValueError(
                    "valid_cap (bench control) supports the single-device "
                    "traced paths and adaptive_embed only"
                )

            program, _ = make_dp_program(
                det_params, arc_params, cfg, mesh=mesh, axis=mesh_axis,
                max_faces_embed=max_faces,
                search_top_k=search_top_k if fuse_search else None,
            )
            if fuse_search:
                self._fused = program
                self._bank_sharding = NamedSharding(mesh, PartitionSpec())
            else:
                self._program = program
        elif aot is not None:
            from facerecognizeonnx_tpu.types import Detections

            def _aot_program(frames):
                boxes, scores, kps, valid, feats = aot(frames)
                return (
                    Detections(boxes=boxes, scores=scores, kps=kps, valid=valid),
                    feats,
                )

            self._program = _aot_program
        elif fuse_search:
            from facerecognizeonnx_tpu.pipeline.fused import frames_to_matches

            # jit retraces per gallery BUCKET shape (power-of-two padded
            # bank, GalleryBank.device_bank_padded); n_rows is traced so
            # enrolls within a bucket hit the compiled program
            self._fused = jax.jit(
                lambda frames, bank, n: frames_to_matches(
                    det_params, arc_params, frames, bank, n, cfg,
                    max_faces, search_top_k, valid_cap=valid_cap,
                )
            )
        else:
            self._program = jax.jit(
                lambda frames: frames_to_features(
                    det_params, arc_params, frames, cfg, max_faces,
                    valid_cap=valid_cap,
                )
            )
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._batches_run = 0
        self._requests_served = 0
        # rolling enqueue→result wall latency window (ms), serving SLO
        # visibility via stats()/GET /metrics
        self._lat: "deque[float]" = deque(maxlen=1024)
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- client

    def identify_async(self, image_bgr: np.ndarray, top_k: int = 1) -> Future:
        req = _Request(
            image=image_bgr, top_k=top_k, t_enqueue=time.perf_counter()
        )
        self._q.put(req)
        return req.future

    def identify(
        self, image_bgr: np.ndarray, top_k: int = 1, timeout: float = 120.0
    ) -> IdentifyResult:
        return self.identify_async(image_bgr, top_k).result(timeout)

    def stats(self):
        out = {
            "batches": self._batches_run,
            "requests": self._requests_served,
            "avg_batch": self._requests_served / max(1, self._batches_run),
        }
        if self._lat:
            # snapshot: the worker thread appends concurrently
            lat = np.fromiter(list(self._lat), np.float64)
            out["latency_ms"] = {
                "p50": round(float(np.percentile(lat, 50)), 3),
                "p90": round(float(np.percentile(lat, 90)), 3),
                "p99": round(float(np.percentile(lat, 99)), 3),
                "window": int(lat.size),
            }
        return out

    def close(self):
        self._q.put(None)
        self._worker.join(timeout=30)

    # ------------------------------------------------------------- worker

    def _letterbox(self, image: np.ndarray) -> Tuple[np.ndarray, float]:
        size = self.cfg.det_input_size
        try:
            from facerecognizeonnx_tpu.runtime.native import (
                letterbox_native,
                native_available,
            )

            if native_available():
                return letterbox_native(image, size)
        except Exception:
            pass
        from facerecognizeonnx_tpu.ops.image import letterbox

        padded, scale = letterbox(jnp.asarray(image), size)
        return np.asarray(padded, np.uint8), scale

    def _run(self):
        """Worker loop, pipelined one batch deep: batch N's device
        programs run WHILE the worker gathers/letterboxes/dispatches
        batch N+1; N resolves right after N+1 dispatches (its device
        work has been overlapping), and immediately when the queue is
        empty — sparse traffic pays no extra latency, saturated
        traffic gets device/host overlap (and, with adaptive_embed,
        hides the bucketed pipeline's count fetch entirely)."""
        closed = False
        pending = None  # dispatched-but-unresolved previous batch ctx
        while not closed:
            try:
                first = self._q.get(timeout=0.25)
            except queue.Empty:
                if pending is not None:
                    self._safe_resolve(pending)
                    pending = None
                continue
            if first is None:
                break
            batch = [first]
            deadline = time.perf_counter() + self.window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    closed = True
                    break
                batch.append(nxt)
            try:
                ctx = self._dispatch(batch)
            except Exception as e:  # pragma: no cover - defensive
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)
                ctx = None
            if pending is not None:
                self._safe_resolve(pending)
                pending = None
            if ctx is not None:
                if closed or self._q.empty():
                    self._safe_resolve(ctx)
                else:
                    pending = ctx
        if pending is not None:
            self._safe_resolve(pending)

    def _safe_resolve(self, ctx):
        try:
            self._resolve(ctx)
        except Exception as e:  # pragma: no cover - defensive
            for req in ctx["batch"]:
                if not req.future.done():
                    req.future.set_exception(e)

    def _dispatch(self, batch: List[_Request]) -> dict:
        """Host preprocess + device program dispatch, NO host sync."""
        frames, scales = [], []
        for req in batch:
            padded, scale = self._letterbox(req.image)
            frames.append(padded)
            scales.append(scale)
        pad_to = self.max_batch
        stacked = np.stack(frames + [frames[-1]] * (pad_to - len(frames)))
        fused = self.fuse_search
        ctx = {"batch": batch, "scales": scales, "names_snap": None,
               "n_rows": 0}
        if fused:
            # empty bank still runs the fused program: n_rows=0 masks
            # every sim, t in _resolve becomes 0, names stay empty
            bank_dev, n_rows, names_snap = self.bank.device_bank_padded(
                sharding=self._bank_sharding
            )
            ctx["names_snap"], ctx["n_rows"] = names_snap, n_rows
            if self.adaptive:
                ctx["handle"] = self._bucketed.start(
                    stacked, n_frames=len(batch),
                    bank_padded=bank_dev, n_rows=n_rows,
                )
            else:
                ctx["out"] = self._fused(
                    jnp.asarray(stacked), bank_dev, jnp.int32(n_rows)
                )
        elif self.adaptive:
            ctx["handle"] = self._bucketed.start(
                stacked, n_frames=len(batch)
            )
        else:
            ctx["out"] = self._program(jnp.asarray(stacked))
        return ctx

    def _resolve(self, ctx: dict):
        """Host fetch + per-request postprocess/future resolution."""
        batch, scales = ctx["batch"], ctx["scales"]
        names_snap, n_rows = ctx["names_snap"], ctx["n_rows"]
        fused = self.fuse_search
        f_sims = f_idx = None
        if fused:
            if self.adaptive:
                dets, feats, f_sims, f_idx, _n = self._bucketed.finish(
                    ctx["handle"]
                )
            else:
                dets, feats, f_sims, f_idx = ctx["out"]
            f_sims, f_idx = np.asarray(f_sims), np.asarray(f_idx)
        elif self.adaptive:
            dets, feats, _n = self._bucketed.finish(ctx["handle"])
        else:
            dets, feats = ctx["out"]
        # fused serving doesn't need the (B, K, 512) feature block on
        # host unless some request asked for MORE matches than the baked
        # top-k — skip the transfer otherwise (16 KB/frame, material on
        # tunneled/remote-device hosts)
        if not fused or (
            len(self.bank)
            and any(r.top_k > self.search_top_k for r in batch)
        ):
            feats = np.asarray(feats)
        dets = jax.tree_util.tree_map(np.asarray, dets)
        self._batches_run += 1
        for i, req in enumerate(batch):
            valid = dets.valid[i][: self.max_faces]
            k = int(valid.sum())
            names: List[List[str]] = [[] for _ in range(self.max_faces)]
            sims = np.zeros((self.max_faces, req.top_k), np.float32)
            if fused and k and req.top_k > self.search_top_k and len(self.bank):
                # the baked program returns search_top_k candidates; a
                # WIDER request must not silently get fewer matches
                # than default serving would return — honor it via the
                # host-side gallery search (the features were already
                # computed in the same dispatch; only this request pays
                # the extra search)
                n, s = self.bank.search(
                    feats[i][:k], top_k=req.top_k, sharded=self.sharded
                )
                for j in range(k):
                    names[j] = n[j]
                    sims[j, : len(s[j])] = s[j]
            elif fused and k:
                # first min(t, n_rows) entries are real rows (pad rows
                # were masked to sim −1 and sort last)
                t = min(req.top_k, self.search_top_k, n_rows)
                for j in range(k):
                    names[j] = [names_snap[ii] for ii in f_idx[i, j, :t]]
                    sims[j, :t] = f_sims[i, j, :t]
            elif k and len(self.bank):
                n, s = self.bank.search(
                    feats[i][:k], top_k=req.top_k, sharded=self.sharded
                )
                for j in range(k):
                    names[j] = n[j]
                    sims[j, : len(s[j])] = s[j]
            inv = 1.0 / scales[i]
            req.future.set_result(
                IdentifyResult(
                    boxes=dets.boxes[i][: self.max_faces] * inv,
                    scores=dets.scores[i][: self.max_faces],
                    valid=valid,
                    names=names,
                    sims=sims,
                )
            )
            self._requests_served += 1
            self._lat.append((time.perf_counter() - req.t_enqueue) * 1e3)
