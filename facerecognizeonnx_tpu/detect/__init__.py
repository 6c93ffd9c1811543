from facerecognizeonnx_tpu.detect.decode import (
    anchor_centers,
    decode_outputs,
    distance2bbox,
    distance2kps,
)

__all__ = ["anchor_centers", "decode_outputs", "distance2bbox", "distance2kps"]
