"""SCRFD learning proof (round-3 roadmap: the recognizer has a
train→recognize e2e test, the detector only had decode/NMS oracles).

Trains the 500m detector briefly on synthetic bright-blob detection —
BCE on anchor scores + masked L1 on the stride-unit bbox distances,
through models/scrfd.apply(train=True) with BN-stat updates — then
checks held-out blobs are detected by the REAL inference path
(fold_inference_params → detect_batch_program → NMS) at the reference
0.5 score threshold, localized on the blob.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import anchor_centers
from facerecognizeonnx_tpu.detect.pipeline import detect_batch_program
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.models.layers import update_bn_stats

SIZE = 128
BLOB_R = 14.0


def _blob_image(rng, cx, cy):
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (BLOB_R / 2) ** 2)))
    img = 20.0 + 30.0 * rng.random((SIZE, SIZE)) + 215.0 * blob
    return np.clip(img, 0, 255)[..., None].repeat(3, axis=-1).astype(np.uint8)


def _targets(cx, cy):
    """Per-stride (score_target, bbox_target, pos_mask) for one blob box."""
    x1, y1 = cx - BLOB_R, cy - BLOB_R
    x2, y2 = cx + BLOB_R, cy + BLOB_R
    out = {}
    for stride in (8, 16, 32):
        pts = anchor_centers(SIZE, stride)  # (N, 2) pixel centers
        inside = (
            (pts[:, 0] > x1) & (pts[:, 0] < x2)
            & (pts[:, 1] > y1) & (pts[:, 1] < y2)
        ).astype(np.float32)
        dist = np.stack(
            [pts[:, 0] - x1, pts[:, 1] - y1, x2 - pts[:, 0], y2 - pts[:, 1]],
            axis=-1,
        ) / stride  # stride units, the scrfd.apply output convention
        out[stride] = (inside[:, None], dist.astype(np.float32), inside)
    return out


def test_scrfd_learns_blob_detection(rng):
    params = scrfd.init_params(jax.random.PRNGKey(0), variant="500m")

    n_train = 24
    centers = rng.uniform(30, SIZE - 30, (n_train, 2)).astype(np.float32)
    images = np.stack([_blob_image(rng, cx, cy) for cx, cy in centers])
    x_train = jnp.asarray((images.astype(np.float32) - 127.5) / 128.0)
    tgt = [_targets(cx, cy) for cx, cy in centers]
    score_t = {
        s: jnp.asarray(np.stack([t[s][0] for t in tgt])) for s in (8, 16, 32)
    }
    bbox_t = {
        s: jnp.asarray(np.stack([t[s][1] for t in tgt])) for s in (8, 16, 32)
    }
    pos_t = {
        s: jnp.asarray(np.stack([t[s][2] for t in tgt])) for s in (8, 16, 32)
    }

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    def loss_fn(p, x):
        outs, stats = scrfd.apply(p, x, train=True)
        loss = 0.0
        for s in (8, 16, 32):
            scores, bbox, _kps = outs[s]
            eps = 1e-6
            sc = jnp.clip(scores.astype(jnp.float32), eps, 1 - eps)
            t = score_t[s]
            # positives are rare: weight them up so the score head moves
            bce = -(25.0 * t * jnp.log(sc) + (1 - t) * jnp.log(1 - sc))
            loss = loss + bce.mean()
            l1 = jnp.abs(bbox.astype(jnp.float32) - bbox_t[s])
            w = pos_t[s][..., None]
            loss = loss + (l1 * w).sum() / (w.sum() * 4 + 1)
        return loss, stats

    @jax.jit
    def step(p, o, x):
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, x)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        p = update_bn_stats(p, stats)
        return p, o, loss

    losses = []
    for i in range(120):
        params, opt_state, loss = step(params, opt_state, x_train)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.25, (losses[0], losses[-1])

    # held-out blobs through the REAL inference path
    cfg = PipelineConfig(det_input_size=SIZE, compute_dtype="float32",
                         pre_nms_topk=64)
    infer = scrfd.fold_inference_params(params)
    held = rng.uniform(35, SIZE - 35, (4, 2)).astype(np.float32)
    test_imgs = jnp.asarray(
        np.stack([_blob_image(rng, cx, cy) for cx, cy in held])
    )
    dets = jax.jit(lambda im: detect_batch_program(infer, im, cfg))(test_imgs)
    valid = np.asarray(dets.valid)
    boxes = np.asarray(dets.boxes)
    hits = 0
    for i, (cx, cy) in enumerate(held):
        if not valid[i].any():
            continue
        b = boxes[i][valid[i]]
        bcx, bcy = (b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2
        if np.any(np.hypot(bcx - cx, bcy - cy) < BLOB_R * 1.5):
            hits += 1
    assert hits >= 3, (hits, valid.sum(axis=1))


# ---------------------------------------------- train/detector.py units


def test_make_targets_center_sampling():
    from facerecognizeonnx_tpu.train.detector import make_targets

    box = np.array([[32.0, 32.0, 96.0, 96.0]])
    tgt = make_targets(box, det_size=128)
    for stride in (8, 16, 32):
        score_t, bbox_t, pos = tgt[stride]
        pts = anchor_centers(128, stride)
        inside = (
            (pts[:, 0] > 32) & (pts[:, 0] < 96)
            & (pts[:, 1] > 32) & (pts[:, 1] < 96)
        )
        assert (pos == inside.astype(np.float32)).all()
        assert (score_t[:, 0] == pos).all()
        # distances in stride units, only where positive
        i = np.flatnonzero(inside)
        if len(i):
            k = i[0]
            expect = np.array(
                [pts[k, 0] - 32, pts[k, 1] - 32, 96 - pts[k, 0], 96 - pts[k, 1]]
            ) / stride
            np.testing.assert_allclose(bbox_t[k], expect, rtol=1e-6)
        assert (bbox_t[~inside] == 0).all()


def test_make_targets_smallest_box_wins():
    from facerecognizeonnx_tpu.train.detector import make_targets

    # big box contains the small one; anchors inside BOTH must take the
    # small box's distances (standard center-sampling tiebreak)
    boxes = np.array([[0.0, 0.0, 128.0, 128.0], [56.0, 56.0, 72.0, 72.0]])
    tgt = make_targets(boxes, det_size=128)
    score_t, bbox_t, pos = tgt[8]
    pts = anchor_centers(128, 8)
    in_small = (
        (pts[:, 0] > 56) & (pts[:, 0] < 72)
        & (pts[:, 1] > 56) & (pts[:, 1] < 72)
    )
    assert in_small.any()
    k = np.flatnonzero(in_small)[0]
    expect = np.array(
        [pts[k, 0] - 56, pts[k, 1] - 56, 72 - pts[k, 0], 72 - pts[k, 1]]
    ) / 8
    np.testing.assert_allclose(bbox_t[k], expect, rtol=1e-6)


def test_make_targets_empty_boxes():
    from facerecognizeonnx_tpu.train.detector import make_targets

    tgt = make_targets(np.zeros((0, 4), np.float32), det_size=64)
    for stride in (8, 16, 32):
        score_t, bbox_t, pos = tgt[stride]
        assert pos.sum() == 0 and (bbox_t == 0).all()


def test_load_detection_dataset_letterbox_scale(tmp_path):
    """Boxes are carried into letterbox pixels by the reference's
    scale=min rule (src/face_detector.cpp:100-121 semantics)."""
    import cv2
    import json

    from facerecognizeonnx_tpu.train.detector import load_detection_dataset

    img = np.full((100, 200, 3), 60, np.uint8)  # wide → scale = 128/200
    cv2.imwrite(str(tmp_path / "wide.png"), img)
    with open(tmp_path / "gt.json", "w") as f:
        json.dump({"wide.png": [[20, 10, 60, 50]]}, f)
    images, boxes = load_detection_dataset(
        str(tmp_path), str(tmp_path / "gt.json"), det_size=128
    )
    assert images.shape == (1, 128, 128, 3)
    s = 128 / 200
    np.testing.assert_allclose(boxes[0][0], np.array([20, 10, 60, 50]) * s)
    # top-left anchored pad: bottom band is zeros (int(100*0.64)=64 rows)
    assert (images[0][64:] == 0).all()
    assert (images[0][:64, :128] == 60).all()


def test_mirror_detection_data_exact():
    """Flip copies: image columns reversed, boxes x-mirrored across the
    canvas width with y untouched — and targets computed on the mirror
    equal the x-mirrored assignment of the original."""
    from facerecognizeonnx_tpu.train.detector import (
        make_targets,
        mirror_detection_data,
    )

    rng = np.random.default_rng(11)
    images = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    boxes = [
        np.array([[8.0, 16.0, 24.0, 40.0]], np.float32),
        np.zeros((0, 4), np.float32),
    ]
    img_f, boxes_f = mirror_detection_data(images, boxes)
    np.testing.assert_array_equal(img_f, images[:, :, ::-1])
    np.testing.assert_allclose(
        boxes_f[0], np.array([[64 - 24, 16.0, 64 - 8, 40.0]]), rtol=0
    )
    assert len(boxes_f[1]) == 0
    # anchor grids are x-symmetric per row, so the positive-anchor count
    # is preserved and the flipped targets are the row-reversed originals
    t0 = make_targets(boxes[0], det_size=64)
    tf = make_targets(boxes_f[0], det_size=64)
    for stride in (8, 16, 32):
        assert t0[stride][2].sum() == tf[stride][2].sum()


def test_train_detector_augment_runs(rng):
    """augment=True doubles the sampled pool with mirrored copies and
    the jitted step still trains (finite decreasing loss)."""
    from facerecognizeonnx_tpu.train.detector import train_detector

    images = np.stack([_blob_image(rng, 40, 64), _blob_image(rng, 90, 30)])
    boxes = [
        np.array([[40 - BLOB_R, 64 - BLOB_R, 40 + BLOB_R, 64 + BLOB_R]], np.float32),
        np.array([[90 - BLOB_R, 30 - BLOB_R, 90 + BLOB_R, 30 + BLOB_R]], np.float32),
    ]
    cfg = PipelineConfig(det_input_size=SIZE, compute_dtype="float32")
    params, losses = train_detector(
        images, boxes, cfg=cfg, steps=12, batch=4, lr=2e-3, seed=0,
        log=lambda *_: None, augment=True,
    )
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
