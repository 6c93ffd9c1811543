"""AOT export of the fused pipeline (jax.export / StableHLO).

The reference's deployment unit is an .onnx file + ONNX Runtime session
(reference src/face_detector.cpp:20-90 loads + optimizes per process
start). The TPU-native analog: trace + lower the fused frames→features
program ONCE, serialize the StableHLO artifact to disk, and let serving
processes load it without retracing Python — jax.export artifacts are
versioned, platform-checked, and load in milliseconds (XLA still
compiles natively per chip type, amortized by the persistent
compilation cache).

Two artifact flavors:

- `save_fused`/`load_fused` — weights BAKED into the artifact as
  constants (like the .onnx file the reference ships). Simple, but a
  w600k_r50 snapshot makes a ~166 MB program and every weight refresh
  re-serializes the whole trace.
- `save_bundle`/`load_bundle` — a single-file .frtz zip whose program
  takes the param LEAVES as arguments: the serialized trace stays a few
  hundred KB, the weights ride an index-keyed .npz beside it, and a
  retrained recognizer drops in via `swap_params` without re-tracing —
  mirroring how the reference separates its binary from its model files
  (reference src/main.cpp:269-270 loads models as data at startup).

Validated on a real v5e with the Pallas warp kernel inside (the Mosaic
payload serializes at trace time): export+save 43.6 s, 176 MB bundle
for the production iresnet50 config, outputs matching the live traced
program (in bf16, two equivalent programs can differ by ~3e-3 in raw
detector scores — enough to reorder NEAR-TIE detections on noise
inputs; real faces' top-k is stable). Cross-platform: a CPU-only build
host exports a platforms=["tpu"] bundle fine — no TPU backend needed
at build time; jax.export rejects running it on the wrong platform.
"""

from __future__ import annotations

import dataclasses
import io
import json
import os
import zipfile
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig


def export_fused(
    det_params,
    arc_params,
    cfg: PipelineConfig,
    batch: int,
    max_faces_embed: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the fused detect→align→embed program for a fixed frame
    batch shape. Returns the artifact bytes (caller persists them)."""
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    def fn(frames_u8):
        dets, feats = frames_to_features(
            det_params, arc_params, frames_u8, cfg, max_faces_embed
        )
        return dets.boxes, dets.scores, dets.kps, dets.valid, feats

    size = cfg.det_input_size
    spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(spec)
    return exported.serialize()


def save_fused(path: str, *args, **kwargs) -> str:
    data = export_fused(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_fused(path_or_bytes) -> Callable:
    """Load a serialized artifact → callable
    frames_u8 (B, S, S, 3) → (boxes, scores, kps, valid, feats).

    Raises ModelLoadError on a missing/corrupt artifact."""
    from facerecognizeonnx_tpu.errors import ModelLoadError

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        try:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        except OSError as e:
            raise ModelLoadError(f"cannot read AOT artifact: {e}") from e
    try:
        exported = jax.export.deserialize(data)
    except Exception as e:
        raise ModelLoadError(f"corrupt AOT artifact: {e}") from e
    return jax.jit(exported.call)


# --------------------------------------------------------------------------
# .frtz bundles: program + weights in one file, weights as call arguments

FRTZ_VERSION = 1
_META = "meta.json"
_PROGRAM = "program.bin"
_PARAMS = "params.npz"


def _export_leaves_fn(
    det_params, arc_params, cfg: PipelineConfig, batch: int,
    max_faces_embed: int, platforms: Optional[Sequence[str]],
):
    """Trace the fused step with the param leaves as ARGUMENTS.

    The pytree structures are closed over at trace time, so a loader
    only needs the flat array list in order (no treedef serialization).
    Returns (exported, leaves)."""
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    det_leaves, det_td = jax.tree_util.tree_flatten(det_params)
    arc_leaves, arc_td = jax.tree_util.tree_flatten(arc_params)
    n_det = len(det_leaves)

    def fn(*args):
        leaves, frames_u8 = args[:-1], args[-1]
        dp = jax.tree_util.tree_unflatten(det_td, leaves[:n_det])
        ap = jax.tree_util.tree_unflatten(arc_td, leaves[n_det:])
        dets, feats = frames_to_features(
            dp, ap, frames_u8, cfg, max_faces_embed=max_faces_embed
        )
        return dets.boxes, dets.scores, dets.kps, dets.valid, feats

    leaves = [np.asarray(l) for l in det_leaves + arc_leaves]
    specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    size = cfg.det_input_size
    frames_spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*specs, frames_spec)
    return exported, leaves


def save_bundle(
    path: str,
    det_params,
    arc_params,
    cfg: PipelineConfig,
    batch: int,
    max_faces_embed: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export the fused step and write the single-file .frtz bundle."""
    if hasattr(det_params, "apply") or hasattr(arc_params, "apply"):
        from facerecognizeonnx_tpu.errors import ModelLoadError

        raise ModelLoadError(
            ".frtz bundles need native param pytrees (an OnnxRunner is "
            "not flattenable) — import the .onnx to .npz first "
            "(onnx_import) or use save_fused, which bakes any callable"
        )
    exported, leaves = _export_leaves_fn(
        det_params, arc_params, cfg, batch, max_faces_embed, platforms
    )
    meta = {
        "format_version": FRTZ_VERSION,
        "config": dataclasses.asdict(cfg),
        "batch": batch,
        "max_faces_embed": max_faces_embed,
        "platforms": list(platforms) if platforms else None,
        "n_leaves": len(leaves),
        "outputs": ["boxes", "scores", "kps", "valid", "features"],
    }
    buf = io.BytesIO()
    np.savez(buf, **{f"{i:05d}": l for i, l in enumerate(leaves)})
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as z:
        z.writestr(_META, json.dumps(meta, indent=1))
        z.writestr(_PROGRAM, exported.serialize())
        z.writestr(_PARAMS, buf.getvalue())
    os.replace(tmp, path)
    return path


class AotPipeline:
    """A loaded .frtz bundle: ``pipe(frames_u8)`` runs the fused step.

    No model-building Python runs at load — the program is the
    serialized trace; only XLA's per-chip binary compile happens (and
    the persistent compilation cache amortizes that like any jit)."""

    def __init__(self, exported, leaves, meta: dict):
        self._exported = exported
        self._leaves = leaves
        self.meta = meta
        self.config = PipelineConfig(**meta["config"])
        self.batch = int(meta["batch"])
        self.max_faces_embed = int(meta["max_faces_embed"])
        self._jitted = jax.jit(exported.call)

    def swap_params(self, det_params=None, arc_params=None) -> None:
        """Drop in refreshed weights (same architecture/shapes) without
        re-exporting: the program takes leaves as arguments. Shape
        mismatches fail loudly at the next call."""
        n = len(self._leaves)
        new = list(self._leaves)
        if det_params is not None:
            det_leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(det_params)]
            new[: len(det_leaves)] = det_leaves
        if arc_params is not None:
            arc_leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(arc_params)]
            new[n - len(arc_leaves):] = arc_leaves
        if len(new) != n:
            from facerecognizeonnx_tpu.errors import ModelLoadError

            raise ModelLoadError(
                f"swap_params leaf count mismatch: bundle has {n}"
            )
        self._leaves = new

    def __call__(self, frames_u8):
        """(batch, S, S, 3) u8 → (boxes, scores, kps, valid, features)."""
        frames_u8 = np.asarray(frames_u8, np.uint8)
        want = (self.batch, self.config.det_input_size,
                self.config.det_input_size, 3)
        if frames_u8.shape != want:
            from facerecognizeonnx_tpu.errors import InvalidInputError

            raise InvalidInputError(
                f"AOT program is compiled for frames {want}; got "
                f"{frames_u8.shape} (AOT shapes are static by design — "
                f"export another batch size if needed)"
            )
        return self._jitted(*self._leaves, frames_u8)


def load_bundle(path: str) -> AotPipeline:
    from facerecognizeonnx_tpu.errors import ModelLoadError

    if not os.path.exists(path):
        raise ModelLoadError(f"AOT bundle not found: {path}")
    try:
        with zipfile.ZipFile(path, "r") as z:
            meta = json.loads(z.read(_META).decode("utf-8"))
            program = z.read(_PROGRAM)
            params_bytes = z.read(_PARAMS)
    except (zipfile.BadZipFile, KeyError) as e:
        raise ModelLoadError(f"not a valid .frtz bundle: {path}: {e}") from e
    if meta.get("format_version") != FRTZ_VERSION:
        raise ModelLoadError(
            f"unsupported bundle format_version={meta.get('format_version')} "
            f"(this build reads {FRTZ_VERSION})"
        )
    try:
        exported = jax.export.deserialize(program)
    except Exception as e:
        raise ModelLoadError(f"corrupt .frtz program: {e}") from e
    with np.load(io.BytesIO(params_bytes)) as data:
        leaves = [data[k] for k in sorted(data.files)]
    if len(leaves) != int(meta["n_leaves"]):
        raise ModelLoadError(
            f"bundle params corrupt: {len(leaves)} leaves, "
            f"meta says {meta['n_leaves']}"
        )
    return AotPipeline(exported, leaves, meta)
