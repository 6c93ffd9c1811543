from facerecognizeonnx_tpu.io.imageio import imread, imwrite, VideoSource

__all__ = ["imread", "imwrite", "VideoSource"]
