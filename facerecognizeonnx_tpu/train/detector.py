"""SCRFD detector fine-tuning on labeled boxes.

Framework extension completing the training story symmetrically: the
recognizer trains from identity folders (train/trainer.py, CLI `train`),
and this module trains/fine-tunes the DETECTOR from images + ground-
truth boxes. The reference ships pre-trained det_500m.onnx only
(reference models/README.md:9-13) and has no training surface at all.

Dataset format: the same ground-truth JSON the CLI `eval --det-gt` mode
scores against — `{"relative/img.jpg": [[x1,y1,x2,y2], ...], ...}` in
original-image pixels, relative to a root directory. One format for
train and eval means a labeled set can be split and round-tripped
without conversion.

Method (the objective validated by the learning proof in
tests/test_detector_train.py):

- images letterboxed to `cfg.det_input_size` with the detector's own
  scale rule (scale = min(S/w, S/h), truncated resize, top-left pad —
  ops/image.py semantics, reference src/face_detector.cpp:100-121);
  GT boxes carried into letterbox pixels by the same scale;
- anchor assignment by center-sampling: an anchor is positive when its
  center lies inside a GT box (smallest containing box wins ties);
  bbox targets are the SCRFD head's stride-unit l,t,r,b distances
  (detect/decode.py conventions);
- loss = positive-weighted BCE on the post-sigmoid scores + masked L1
  on the distances, through `models/scrfd.apply(train=True)` with
  BN-statistic updates folded back each step.

The returned/saved params are train-form (unfolded BN); saving with
`utils.checkpoint.save_params` yields an .npz that
`FaceDetector.load_model` accepts directly (it folds BN on load,
pipeline/api.py).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import anchor_centers


def load_detection_dataset(
    root: str,
    gt_json: str,
    det_size: int,
    imread_fn: Optional[Callable] = None,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """→ (images (N, S, S, 3) uint8 letterboxed BGR, boxes per image
    (M_i, 4) float32 x1y1x2y2 in letterbox pixels). Unreadable images
    are skipped."""
    import cv2

    if imread_fn is None:
        from facerecognizeonnx_tpu.io.imageio import imread as imread_fn

    with open(gt_json) as f:
        gt = json.load(f)
    images, boxes_out = [], []
    for fname, boxes in sorted(gt.items()):
        path = fname if os.path.isabs(fname) else os.path.join(root, fname)
        img = imread_fn(path)
        if img is None:
            continue
        h, w = img.shape[:2]
        scale = min(det_size / w, det_size / h)
        nw, nh = int(w * scale), int(h * scale)
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((det_size, det_size, 3), np.uint8)
        canvas[:nh, :nw] = resized
        images.append(canvas)
        boxes_out.append(np.asarray(boxes, np.float32).reshape(-1, 4) * scale)
    if not images:
        raise ValueError(f"no readable images listed in {gt_json}")
    return np.stack(images), boxes_out


def make_targets(
    boxes: np.ndarray,
    det_size: int,
    strides: Sequence[int] = (8, 16, 32),
    num_anchors: int = 2,
) -> Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """One image's GT boxes → per-stride (score_t (N, 1), bbox_t (N, 4)
    stride units, pos (N,)) matching scrfd.apply's anchor order."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    out = {}
    for stride in strides:
        pts = anchor_centers(det_size, stride, num_anchors)  # (N, 2) px
        n = pts.shape[0]
        pos = np.zeros(n, np.float32)
        dist = np.zeros((n, 4), np.float32)
        if len(boxes):
            # (N, M): anchor center strictly inside box
            inside = (
                (pts[:, 0:1] > boxes[None, :, 0])
                & (pts[:, 0:1] < boxes[None, :, 2])
                & (pts[:, 1:2] > boxes[None, :, 1])
                & (pts[:, 1:2] < boxes[None, :, 3])
            )
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            # smallest containing box wins (standard center-sampling tie)
            cost = np.where(inside, areas[None, :], np.inf)
            owner = cost.argmin(axis=1)
            pos = inside.any(axis=1).astype(np.float32)
            b = boxes[owner]  # (N, 4)
            dist = (
                np.stack(
                    [
                        pts[:, 0] - b[:, 0],
                        pts[:, 1] - b[:, 1],
                        b[:, 2] - pts[:, 0],
                        b[:, 3] - pts[:, 1],
                    ],
                    axis=-1,
                )
                / stride
            ).astype(np.float32)
            dist *= pos[:, None]  # targets only matter where positive
        out[stride] = (pos[:, None], dist, pos)
    return out


def mirror_detection_data(
    images: np.ndarray, boxes: List[np.ndarray]
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Horizontal-flip copies of (letterboxed images, boxes): the whole
    canvas flips and box x-coords mirror across the canvas width
    (x1' = S - x2, x2' = S - x1). Convs are translation-equivariant, so
    training on right-anchored flipped content is valid even though
    serving letterboxes anchor top-left."""
    s = images.shape[2]
    img_f = images[:, :, ::-1].copy()
    boxes_f = [
        np.stack([s - b[:, 2], b[:, 1], s - b[:, 0], b[:, 3]], axis=-1)
        if len(b) else b
        for b in boxes
    ]
    return img_f, boxes_f


def train_detector(
    images: np.ndarray,
    boxes: List[np.ndarray],
    cfg: PipelineConfig = PipelineConfig(),
    steps: int = 200,
    batch: int = 8,
    lr: float = 2e-3,
    pos_weight: float = 25.0,
    seed: int = 0,
    init_params=None,
    log: Callable[[str], None] = print,
    log_every: int = 20,
    augment: bool = False,
):
    """Fine-tune (or train from scratch when init_params is None) the
    `cfg.scrfd_variant` SCRFD on (N, S, S, 3) uint8 letterboxed images.

    Returns (train-form params, losses list). Device-side: one jitted
    train step; batches are sampled with replacement per step.
    augment=True doubles the dataset with horizontal-flip mirrors
    (mirror_detection_data) before target assignment — the flip
    augmentation every detection recipe uses, done as dataset doubling
    because targets are precomputed per image."""
    import jax
    import jax.numpy as jnp
    import optax

    from facerecognizeonnx_tpu.models import scrfd
    from facerecognizeonnx_tpu.models.layers import update_bn_stats

    if augment:
        img_f, boxes_f = mirror_detection_data(images, boxes)
        images = np.concatenate([images, img_f])
        boxes = list(boxes) + boxes_f

    det_size = images.shape[1]
    strides = tuple(cfg.strides)
    params = (
        init_params
        if init_params is not None
        else scrfd.init_params(
            jax.random.PRNGKey(seed), variant=cfg.scrfd_variant
        )
    )

    tgt = [make_targets(b, det_size, strides, cfg.num_anchors) for b in boxes]
    score_t = {
        s: jnp.asarray(np.stack([t[s][0] for t in tgt])) for s in strides
    }
    bbox_t = {
        s: jnp.asarray(np.stack([t[s][1] for t in tgt])) for s in strides
    }
    pos_t = {
        s: jnp.asarray(np.stack([t[s][2] for t in tgt])) for s in strides
    }
    x_all = jnp.asarray(
        (images.astype(np.float32)[..., ::-1] - cfg.pixel_mean)
        / cfg.pixel_scale
    )  # BGR→RGB + reference normalization (src/face_detector.cpp:124-136)

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, x, st, bt, pt):
        outs, stats = scrfd.apply(p, x, train=True)
        loss = 0.0
        for s in strides:
            scores, bbox, _kps = outs[s]
            eps = 1e-6
            sc = jnp.clip(scores.astype(jnp.float32), eps, 1 - eps)
            t = st[s]
            bce = -(pos_weight * t * jnp.log(sc) + (1 - t) * jnp.log(1 - sc))
            loss = loss + bce.mean()
            l1 = jnp.abs(bbox.astype(jnp.float32) - bt[s])
            w = pt[s][..., None]
            loss = loss + (l1 * w).sum() / (w.sum() * 4 + 1)
        return loss, stats

    @jax.jit
    def step(p, o, x, st, bt, pt):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, x, st, bt, pt
        )
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        p = update_bn_stats(p, stats)
        return p, o, loss

    rng = np.random.default_rng(seed)
    n = images.shape[0]
    losses = []
    for i in range(steps):
        idx = rng.integers(0, n, min(batch, n))
        st = {s: score_t[s][idx] for s in strides}
        bt = {s: bbox_t[s][idx] for s in strides}
        pt = {s: pos_t[s][idx] for s in strides}
        params, opt_state, loss = step(params, opt_state, x_all[idx], st, bt, pt)
        losses.append(float(loss))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log(f"step {i + 1}/{steps} loss {losses[-1]:.4f}")
    return params, losses
