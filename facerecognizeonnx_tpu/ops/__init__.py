"""Device-side image/geometry ops (jnp + Pallas).

TPU-native replacement for the reference's OpenCV layer (SURVEY.md §1 L2):
letterbox resize, BGR→RGB [-1,1] normalization, bilinear affine warp,
Umeyama similarity transform, fixed-shape NMS.
"""

from facerecognizeonnx_tpu.ops.image import (
    letterbox_params,
    letterbox,
    normalize_to_rgb,
    resize_bilinear,
)
from facerecognizeonnx_tpu.ops.umeyama import umeyama, ARCFACE_DST_5PTS
from facerecognizeonnx_tpu.ops.warp import warp_affine, invert_affine, crop_resize_affine
from facerecognizeonnx_tpu.ops.nms import nms_fixed, iou_matrix

__all__ = [
    "letterbox_params",
    "letterbox",
    "normalize_to_rgb",
    "resize_bilinear",
    "umeyama",
    "ARCFACE_DST_5PTS",
    "warp_affine",
    "invert_affine",
    "crop_resize_affine",
    "nms_fixed",
    "iou_matrix",
]
