from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.sharded_ops import (
    sharded_batch_embed,
    sharded_topk_search,
)

__all__ = ["make_mesh", "sharded_topk_search", "sharded_batch_embed"]
