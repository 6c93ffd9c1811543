from facerecognizeonnx_tpu.train.arcface_loss import (
    arcface_margin_logits,
    init_classifier,
    softmax_xent,
)
from facerecognizeonnx_tpu.train.fit import fit, warmup_cosine
from facerecognizeonnx_tpu.train.trainer import TrainState, make_train_step

__all__ = [
    "arcface_margin_logits",
    "init_classifier",
    "softmax_xent",
    "TrainState",
    "make_train_step",
    "fit",
    "warmup_cosine",
]
