from .decode import ctdet_decode, heat_nms
from .deform_conv import modulated_deform_conv
from .nms import batched_nms_fixed, nms_fixed, pairwise_iou_xyxy
from .roi_align import multilevel_roi_align, roi_align
from .roi_align_rotated import (
    nms_rotated_fixed,
    pairwise_iou_rotated_jnp,
    roi_align_rotated,
)
from .target_gen import gaussian_radius, gen_centernet_targets, gen_centernet_targets_batch

__all__ = [
    "batched_nms_fixed",
    "ctdet_decode",
    "multilevel_roi_align",
    "nms_fixed",
    "nms_rotated_fixed",
    "pairwise_iou_rotated_jnp",
    "pairwise_iou_xyxy",
    "roi_align",
    "roi_align_rotated",
    "gaussian_radius",
    "gen_centernet_targets",
    "gen_centernet_targets_batch",
    "heat_nms",
    "modulated_deform_conv",
]
