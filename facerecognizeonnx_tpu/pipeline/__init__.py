from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer

__all__ = ["FaceDetector", "FaceRecognizer"]
