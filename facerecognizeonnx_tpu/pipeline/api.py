"""Reference-compatible public API.

Stateful wrapper classes reproducing the reference component surface
bit-for-bit in behavior (SURVEY.md §2):

  FaceDetector:   loadModel/load_model, detect                (C2-C6)
  FaceRecognizer: loadModel, extractFeature/extract_feature,
                  extractFeatureSimple, compareFaces          (C7-C13)

Under the hood each method dispatches one fused, jit-cached XLA program
per input-shape bucket — no host work between preprocess and results.
Reference defaults preserved: score 0.5 / NMS 0.4
(src/face_detector.h:20), match threshold 0.6 on the (cos+1)/2 scale
(src/main.cpp:118), 640/112 inputs, 512-d features.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import DEFAULT_CONFIG, PipelineConfig
from facerecognizeonnx_tpu.detect.pipeline import detect_program
from facerecognizeonnx_tpu.embed.pipeline import (
    embed_program,
    embed_simple_program,
)
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.types import Detections, FaceBox, face_boxes_to_arrays
from facerecognizeonnx_tpu.utils import checkpoint
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


def _load_weights(path: Optional[str], init_fn, seed: int, native_mapper=None):
    """Weights from .npz / .onnx, or deterministic init when path=None.

    For .onnx, a native_mapper (e.g. onnx_import.native_map.map_arcface)
    is tried first: it transplants the weights onto the fast NHWC native
    model and numerically self-verifies; on any mismatch the file runs
    through the generic graph executor instead.

    Raises ModelLoadError on missing/corrupt weights; the load_model
    wrappers convert it to the reference's bool-return contract
    (src/main.cpp:274-283 exits on load failure; here the caller decides).
    """
    from facerecognizeonnx_tpu.errors import ModelLoadError

    if path is None:
        return init_on_host(lambda: init_fn(jax.random.PRNGKey(seed)))
    if path.endswith(".onnx"):
        from facerecognizeonnx_tpu.onnx_import import importer

        try:
            if native_mapper is not None:
                mapped = native_mapper(path)
                if mapped is not None:
                    print("ONNX weights mapped onto the native TPU model")
                    return mapped
            return importer.load_onnx_params(path)
        except (OSError, ValueError, NotImplementedError) as e:
            raise ModelLoadError(f"cannot load ONNX model {path!r}: {e}") from e
    try:
        return checkpoint.load_params(path)
    except (OSError, ValueError) as e:
        raise ModelLoadError(f"cannot load weights {path!r}: {e}") from e


class FaceDetector:
    """SCRFD face detector (reference: src/face_detector.h:14-41)."""

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = config
        self.params = None
        self._jit_cache = {}

    # reference: bool loadModel(const std::string&) — src/face_detector.h:19
    def load_model(self, model_path: Optional[str] = None) -> bool:
        from facerecognizeonnx_tpu.errors import ModelLoadError

        try:
            params = _load_weights(
                model_path,
                lambda key: scrfd.init_params(key, variant=self.cfg.scrfd_variant),
                self.cfg.seed,
            )
        except ModelLoadError as e:
            print(f"Error loading model: {e}")
            return False
        # inference-only wrapper → exact post-conv BN folding (all SCRFD
        # BNs are post-conv; see models/scrfd.fold_inference_params)
        if (
            isinstance(params, dict)
            and "backbone" in params
            and "bn" in params.get("stem", {})
        ):
            params = scrfd.fold_inference_params(params)
        self.params = params
        print("Face detector model loaded successfully!")
        print(f"Using input size: {self.cfg.det_input_size}x{self.cfg.det_input_size}")
        return True

    loadModel = load_model

    def detect(
        self,
        image: np.ndarray,
        score_threshold: Optional[float] = None,
        nms_threshold: Optional[float] = None,
    ) -> List[FaceBox]:
        """BGR uint8 (H, W, 3) → FaceBox list in original pixel coords.

        Empty list on missing model / empty image, matching the
        reference's defensive returns (src/face_detector.cpp:142-156)."""
        if self.params is None:
            print("Model not loaded!")
            return []
        if image is None or image.size == 0 or image.ndim != 3:
            print("Input image is empty!")
            return []
        dets = self.detect_raw(image, score_threshold, nms_threshold)
        faces = dets.to_face_boxes()
        # reference truncates rect coords to int (src/face_detector.cpp:260-265)
        for f in faces:
            x1, y1 = int(f.box[0]), int(f.box[1])
            x2, y2 = int(f.box[0] + f.box[2]), int(f.box[1] + f.box[3])
            f.box = (x1, y1, x2 - x1, y2 - y1)
        return faces

    def detect_raw(
        self,
        image: np.ndarray,
        score_threshold: Optional[float] = None,
        nms_threshold: Optional[float] = None,
    ) -> Detections:
        """Full-precision fixed-K Detections (device arrays)."""
        size = self.cfg.det_input_size
        if self.cfg.host_letterbox and image.shape[:2] != (size, size):
            from facerecognizeonnx_tpu.runtime.native import (
                letterbox_native,
                native_available,
            )

            if native_available():
                padded, scale = letterbox_native(np.asarray(image), size)
                dets = self._detect_jit(padded, score_threshold, nms_threshold)
                inv = 1.0 / scale
                return Detections(
                    boxes=np.asarray(dets.boxes) * inv,
                    scores=np.asarray(dets.scores),
                    kps=np.asarray(dets.kps) * inv,
                    valid=np.asarray(dets.valid),
                )
        return self._detect_jit(image, score_threshold, nms_threshold)

    def detect_batch(self, images: Sequence[np.ndarray]) -> List[List[FaceBox]]:
        """Batched detect: same-shaped BGR frames run as ONE device
        program (on-device letterbox + detect_batch_program); mixed
        shapes bucket by shape, one dispatch per bucket. Returns a
        FaceBox list per image with the reference's int-truncated rects
        — `detect(img)` semantics at batch throughput (the reference is
        strictly one image per Run, src/face_detector.cpp:139-183)."""
        if self.params is None:
            print("Model not loaded!")
            return [[] for _ in images]
        results: List[List[FaceBox]] = [[] for _ in images]
        buckets: dict = {}
        for i, img in enumerate(images):
            if img is None or img.size == 0 or img.ndim != 3:
                continue
            buckets.setdefault(img.shape, []).append(i)
        size = self.cfg.det_input_size
        for shape, idxs in buckets.items():
            key = ("batch", shape)
            if key not in self._jit_cache:
                cfg = self.cfg
                from facerecognizeonnx_tpu.detect.decode import decode_outputs
                from facerecognizeonnx_tpu.detect.pipeline import (
                    _forward,
                    postprocess,
                )
                from facerecognizeonnx_tpu.ops.image import (
                    letterbox,
                    normalize_to_rgb,
                )

                def batch_fn(frames, _cfg=cfg):
                    # exactly detect_program, vmapped: per-image scale
                    # feeds postprocess so the /scale-BEFORE-NMS order
                    # (reference src/face_detector.cpp:255-258 → :356)
                    # and its int-rect IoU space match detect() per image
                    padded, scale = jax.vmap(lambda f: letterbox(f, size))(frames)
                    dtype = jnp.dtype(_cfg.compute_dtype)
                    x = normalize_to_rgb(
                        padded, _cfg.pixel_mean, _cfg.pixel_scale, dtype=dtype
                    )
                    outs = _forward(self.params, x, dtype)
                    scores, boxes, kps = decode_outputs(
                        outs, _cfg.det_input_size, _cfg.num_anchors
                    )
                    return jax.vmap(
                        lambda s, b, k, sc: postprocess(s, b, k, sc, _cfg)
                    )(scores, boxes, kps, scale)

                self._jit_cache[key] = jax.jit(batch_fn)
            frames = jnp.asarray(np.stack([images[i] for i in idxs]))
            dets = self._jit_cache[key](frames)
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            kps = np.asarray(dets.kps)
            valid = np.asarray(dets.valid)
            for row, i in enumerate(idxs):
                per_image = Detections(
                    boxes=boxes[row],
                    scores=scores[row],
                    kps=kps[row],
                    valid=valid[row],
                ).to_face_boxes()
                for f in per_image:
                    x1, y1 = int(f.box[0]), int(f.box[1])
                    x2 = int(f.box[0] + f.box[2])
                    y2 = int(f.box[1] + f.box[3])
                    f.box = (x1, y1, x2 - x1, y2 - y1)
                results[i] = per_image
        return results

    def detect_files(
        self,
        paths: Sequence[str],
        batch_size: int = 32,
        threads: int = 1,
    ) -> List[List[FaceBox]]:
        """Bulk detection over image FILES.

        The native C++ loader (runtime/native.NativeImageLoader) reads,
        decodes (libjpeg/libpng) and letterboxes paths concurrently with
        device execution; frames then run as fixed-shape padded batches
        of ONE compiled program (partial tail batches are zero-padded,
        pad rows discarded). Per-file FaceBox lists in original pixel
        coords with exact `detect()` parity (the per-image scale feeds
        postprocess, so /scale happens BEFORE NMS in the reference's
        int-rect IoU space, src/face_detector.cpp:255-258,340-354).
        Unreadable/undecodable files get []. Falls back to
        imread + detect_batch when native codecs are unavailable.
        """
        if self.params is None:
            print("Model not loaded!")
            return [[] for _ in paths]
        from facerecognizeonnx_tpu.runtime import native

        if not native.codecs_available():
            from facerecognizeonnx_tpu.io.imageio import imread

            return self.detect_batch([imread(p) for p in paths])

        size = self.cfg.det_input_size
        key = ("padded_batch", batch_size)
        if key not in self._jit_cache:
            cfg = self.cfg
            from facerecognizeonnx_tpu.detect.decode import decode_outputs
            from facerecognizeonnx_tpu.detect.pipeline import _forward, postprocess
            from facerecognizeonnx_tpu.ops.image import normalize_to_rgb

            def padded_batch_fn(frames, scales, _cfg=cfg):
                dtype = jnp.dtype(_cfg.compute_dtype)
                x = normalize_to_rgb(
                    frames, _cfg.pixel_mean, _cfg.pixel_scale, dtype=dtype
                )
                outs = _forward(self.params, x, dtype)
                scores, boxes, kps = decode_outputs(
                    outs, _cfg.det_input_size, _cfg.num_anchors
                )
                return jax.vmap(
                    lambda s, b, k, sc: postprocess(s, b, k, sc, _cfg)
                )(scores, boxes, kps, scales)

            self._jit_cache[key] = jax.jit(padded_batch_fn)
        fn = self._jit_cache[key]

        results: List[List[FaceBox]] = [[] for _ in paths]
        buf_frames: List[np.ndarray] = []
        buf_scales: List[float] = []
        buf_idx: List[int] = []

        def flush():
            if not buf_idx:
                return
            n = len(buf_idx)
            frames = np.zeros((batch_size, size, size, 3), np.uint8)
            scales = np.ones(batch_size, np.float32)
            frames[:n] = np.stack(buf_frames)
            scales[:n] = buf_scales
            dets = fn(jnp.asarray(frames), jnp.asarray(scales))
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            kps = np.asarray(dets.kps)
            valid = np.asarray(dets.valid)
            for row, i in enumerate(buf_idx):
                faces = Detections(
                    boxes=boxes[row], scores=scores[row],
                    kps=kps[row], valid=valid[row],
                ).to_face_boxes()
                for f in faces:
                    x1, y1 = int(f.box[0]), int(f.box[1])
                    x2 = int(f.box[0] + f.box[2])
                    y2 = int(f.box[1] + f.box[3])
                    f.box = (x1, y1, x2 - x1, y2 - y1)
                results[i] = faces
            buf_frames.clear()
            buf_scales.clear()
            buf_idx.clear()

        with native.NativeImageLoader(
            paths, size, threads=threads, capacity=max(8, 2 * batch_size)
        ) as loader:
            for idx, frame, scale in loader:
                if frame is None:
                    continue
                buf_frames.append(frame)
                buf_scales.append(scale)
                buf_idx.append(idx)
                if len(buf_idx) == batch_size:
                    flush()
        flush()
        return results

    def _detect_jit(self, image, score_threshold, nms_threshold) -> Detections:
        key = (image.shape, score_threshold, nms_threshold)
        if key not in self._jit_cache:
            cfg = self.cfg
            self._jit_cache[key] = jax.jit(
                lambda img: detect_program(
                    self.params, img, cfg, score_threshold, nms_threshold
                )
            )
        return self._jit_cache[key](jnp.asarray(image))


class FaceRecognizer:
    """ArcFace embedder + comparator (reference: src/face_recognizer.h:10-34)."""

    def __init__(self, config: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = config
        self.params = None
        self._jit_cache = {}

    def load_model(self, model_path: Optional[str] = None) -> bool:
        def _map_native(path):
            from facerecognizeonnx_tpu.onnx_import.native_map import map_recognizer

            return map_recognizer(
                path, self.cfg.rec_arch, input_size=self.cfg.rec_input_size
            )

        from facerecognizeonnx_tpu.errors import ModelLoadError
        from facerecognizeonnx_tpu.models import (
            recognizer_module,
            recognizer_module_for,
        )

        try:
            arch_mod = recognizer_module(self.cfg.rec_arch)
            params = _load_weights(
                model_path,
                lambda key: arch_mod.init_params(
                    key, arch=self.cfg.rec_arch,
                    input_size=self.cfg.rec_input_size,
                    feature_dim=self.cfg.feature_dim,
                ),
                self.cfg.seed + 1,
                native_mapper=_map_native,
            )
        except ModelLoadError as e:
            print(f"Error loading model: {e}")
            return False
        # exact fold of the post-conv/post-FC BNs (inference wrapper never
        # trains; arcface folds its post-conv half, mobilefacenet folds ALL
        # of its BNs — see each model's fold_inference_params)
        if isinstance(params, dict) and "features_bn" in params:
            params = recognizer_module_for(params).fold_inference_params(params)
        self.params = params
        print("Face recognizer model loaded successfully!")
        print(f"Using input size: {self.cfg.rec_input_size}x{self.cfg.rec_input_size}")
        if self.cfg.recognizer_quant == "w8a8":
            self.quantize()
        return True

    loadModel = load_model

    def quantize(
        self,
        calib_crops: Optional[np.ndarray] = None,
        min_channels: int = 0,
    ) -> bool:
        """Switch the loaded recognizer to w8a8 int8 (models/quant.py).

        calib_crops: (N, S, S, 3) uint8 BGR aligned crops for activation
        calibration — pass real enrollment crops for best fidelity;
        defaults to synthetic noise (fine for benchmarking, adequate for
        the conservatively-clipped symmetric scheme). min_channels=128
        quantizes only the wide convs where v5e int8 measures faster
        than bf16. No-op False when no native params are loaded
        (OnnxRunner graphs are not quantized).
        """
        if self.params is None:
            print("Model not loaded!")
            return False
        if hasattr(self.params, "apply"):
            print("Quantization needs native model params (not an ONNX graph)")
            return False
        from facerecognizeonnx_tpu.models import quant, recognizer_module_for
        from facerecognizeonnx_tpu.ops.image import normalize_to_rgb

        mod = recognizer_module_for(self.params)
        s = self.cfg.rec_input_size
        if calib_crops is None:
            rng = np.random.default_rng(self.cfg.seed)
            calib_crops = rng.integers(0, 256, (64, s, s, 3)).astype(np.uint8)
        x = normalize_to_rgb(
            jnp.asarray(calib_crops), self.cfg.pixel_mean, self.cfg.pixel_scale,
            dtype=jnp.dtype(self.cfg.compute_dtype),
        )
        # one jitted program, not ~110 eager dispatches over the tunnel
        qstate = jax.jit(
            lambda p, c: quant.quantize_recognizer(
                mod.apply, p, c, min_channels=min_channels
            )
        )(self.params, x)
        self.params = quant.QuantizedRecognizer(mod.apply, self.params, qstate)
        self._jit_cache.clear()
        print("Recognizer quantized to w8a8 int8")
        return True

    def extract_feature(self, image: np.ndarray, face: FaceBox) -> np.ndarray:
        """Aligned 512-d L2-normalized feature for one face.

        Reference: extractFeature = alignFace → preprocess → Run → L2
        (src/face_recognizer.cpp:236-304). Empty array on failure."""
        feats = self.extract_features(image, [face])
        return feats[0] if len(feats) else np.zeros(0, np.float32)

    extractFeature = extract_feature

    def extract_features(
        self, image: np.ndarray, faces: Sequence[FaceBox]
    ) -> np.ndarray:
        """Batched: all K faces of a frame in ONE device program → (K, 512).

        (The reference embeds faces one Session::Run at a time,
        src/main.cpp:226 — this batched form is the TPU-native upgrade.)"""
        if self.params is None:
            print("Model not loaded!")
            return np.zeros((0, 512), np.float32)
        if image is None or image.size == 0 or not faces:
            print("Input image is empty!")
            return np.zeros((0, 512), np.float32)
        k_bucket = max(8, 1 << (len(faces) - 1).bit_length())
        dets = face_boxes_to_arrays(list(faces), k_bucket)
        key = ("embed", image.shape, k_bucket)
        if key not in self._jit_cache:
            cfg = self.cfg
            self._jit_cache[key] = jax.jit(
                lambda img, kps, boxes, valid: embed_program(
                    self.params, img, kps, boxes, valid, cfg
                )
            )
        feats = self._jit_cache[key](
            jnp.asarray(image),
            jnp.asarray(dets.kps),
            jnp.asarray(dets.boxes),
            jnp.asarray(dets.valid),
        )
        return np.asarray(feats)[: len(faces)]

    def extract_feature_simple(self, image: np.ndarray) -> np.ndarray:
        """Whole-image resize → embed, no detection/alignment.

        Reference: extractFeatureSimple (src/face_recognizer.cpp:152-234)."""
        if self.params is None:
            print("Model not loaded!")
            return np.zeros(0, np.float32)
        if image is None or image.size == 0:
            print("Input image is empty!")
            return np.zeros(0, np.float32)
        key = ("simple", image.shape)
        if key not in self._jit_cache:
            cfg = self.cfg
            self._jit_cache[key] = jax.jit(
                lambda img: embed_simple_program(self.params, img, cfg)
            )
        return np.asarray(self._jit_cache[key](jnp.asarray(image)))

    extractFeatureSimple = extract_feature_simple

    @staticmethod
    def compare_faces(feature1, feature2) -> float:
        """(dot+1)/2 similarity with the reference's guards
        (src/face_recognizer.cpp:320-334: 0.0 on size mismatch/empty)."""
        f1 = np.asarray(feature1, np.float32).ravel()
        f2 = np.asarray(feature2, np.float32).ravel()
        if f1.size != f2.size or f1.size == 0:
            return 0.0
        return float((np.dot(f1, f2) + 1.0) / 2.0)

    compareFaces = compare_faces
