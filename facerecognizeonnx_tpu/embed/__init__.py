from facerecognizeonnx_tpu.embed.pipeline import (
    align_faces,
    embed_program,
    embed_simple_program,
)

__all__ = ["align_faces", "embed_program", "embed_simple_program"]
