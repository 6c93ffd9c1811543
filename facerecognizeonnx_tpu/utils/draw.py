"""Host-side result overlay (reference drawFaceInfo, src/main.cpp:6-37):
green bbox, red landmark dots, score/sim/label text on a filled
background. Drawing stays on host — it never touches the device path.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from facerecognizeonnx_tpu.types import FaceBox


def draw_face_info(
    image: np.ndarray,
    face: FaceBox,
    label: str = "",
    similarity: float = -1.0,
) -> None:
    if cv2 is None:
        return
    x, y, w, h = (int(v) for v in face.box)
    cv2.rectangle(image, (x, y), (x + w, y + h), (0, 255, 0), 2)
    for lx, ly in np.asarray(face.landmarks):
        cv2.circle(image, (int(lx), int(ly)), 2, (0, 0, 255), -1)
    text = f"Score: {face.score:.3f}"
    if similarity >= 0:
        text += f" | Sim: {similarity:.3f}"
    if label:
        text = f"{label} | {text}"
    (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
    cv2.rectangle(image, (x, y - th - 10), (x + tw, y), (0, 255, 0), -1)
    cv2.putText(
        image, text, (x, y - 5), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1
    )
