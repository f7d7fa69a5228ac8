"""TensorMask for the TPU-native framework.

Counterpart of ``/root/reference/projects/TensorMask/tensormask/``: dense
sliding-window instance segmentation (arXiv:1903.12174) with the aligned
mask representation, the bipyramid head, and SwapAlign2Nat — the latter as
an einsum-of-tent-matrices op
(``detectron2_centernet_tpu/ops/swap_align2nat.py``) instead of the
reference's CUDA kernel.

    from tensormask_tpu import add_tensormask_config
    cfg = get_cfg(); add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
"""

from .arch import TensorMask, TensorMaskHead, sigmoid_focal_loss_star
from .config import add_tensormask_config

__all__ = [
    "TensorMask",
    "TensorMaskHead",
    "add_tensormask_config",
    "sigmoid_focal_loss_star",
]
