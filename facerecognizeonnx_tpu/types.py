"""Result types.

`FaceBox` mirrors the reference POD struct (reference:
src/face_detector.h:8-12 — cv::Rect box, float score, 5 landmarks)
for the host-facing API. `Detections` is its device-side, fixed-shape,
batched structure-of-arrays form: XLA needs static shapes, so a frame
always yields `max_faces` slots plus a validity mask.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np


@dataclasses.dataclass
class FaceBox:
    """One detected face in original-image pixel coordinates.

    box = (x, y, w, h) like cv::Rect (reference: src/face_detector.cpp:260-265);
    landmarks = (5, 2) array ordered L-eye, R-eye, nose, L-mouth, R-mouth.
    """

    box: tuple  # (x, y, w, h) floats
    score: float
    landmarks: np.ndarray  # (5, 2) float32

    @property
    def x1(self) -> float:
        return self.box[0]

    @property
    def y1(self) -> float:
        return self.box[1]

    @property
    def x2(self) -> float:
        return self.box[0] + self.box[2]

    @property
    def y2(self) -> float:
        return self.box[1] + self.box[3]


class Detections(NamedTuple):
    """Fixed-shape device detections for one image (or a batch).

    boxes:  (..., K, 4) x1,y1,x2,y2 in original-image pixels
    scores: (..., K)
    kps:    (..., K, 5, 2)
    valid:  (..., K) bool — True for real detections, False for padding.

    Slots are sorted by descending score; padding slots carry score 0.
    """

    boxes: np.ndarray
    scores: np.ndarray
    kps: np.ndarray
    valid: np.ndarray

    def count(self):
        return self.valid.sum(-1)

    def to_face_boxes(self) -> list:
        """Convert a single image's detections to host FaceBox list."""
        boxes = np.asarray(self.boxes)
        scores = np.asarray(self.scores)
        kps = np.asarray(self.kps)
        valid = np.asarray(self.valid)
        if boxes.ndim != 2:
            raise ValueError("to_face_boxes expects unbatched detections")
        out = []
        for i in range(boxes.shape[0]):
            if not valid[i]:
                continue
            x1, y1, x2, y2 = (float(v) for v in boxes[i])
            out.append(
                FaceBox(
                    box=(x1, y1, x2 - x1, y2 - y1),
                    score=float(scores[i]),
                    landmarks=np.asarray(kps[i], dtype=np.float32),
                )
            )
        return out


def face_boxes_to_arrays(faces, max_faces: int):
    """Pack a FaceBox list into fixed-shape arrays (inverse of to_face_boxes)."""
    boxes = np.zeros((max_faces, 4), np.float32)
    scores = np.zeros((max_faces,), np.float32)
    kps = np.zeros((max_faces, 5, 2), np.float32)
    valid = np.zeros((max_faces,), bool)
    for i, f in enumerate(faces[:max_faces]):
        boxes[i] = (f.x1, f.y1, f.x2, f.y2)
        scores[i] = f.score
        kps[i] = f.landmarks
        valid[i] = True
    return Detections(boxes=boxes, scores=scores, kps=kps, valid=valid)
