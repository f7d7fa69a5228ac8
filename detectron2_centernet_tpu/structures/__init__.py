from .boxes import (
    Boxes,
    BoxMode,
    matched_boxlist_iou,
    pairwise_intersection,
    pairwise_ioa,
    pairwise_iou,
)
from .image_batch import ImageBatch, ImageList, pad_to_divisibility
from .instances import Instances
from .keypoints import Keypoints, heatmaps_to_keypoints, keypoints_to_heatmap_targets
from .rotated_boxes import (
    RotatedBoxes,
    nms_rotated,
    pairwise_iou_rotated,
)
from .masks import (
    BitMasks,
    PolygonMasks,
    paste_masks_in_image,
    polygons_to_bitmask,
    rasterize_in_box,
)

__all__ = [
    "BitMasks",
    "Boxes",
    "BoxMode",
    "ImageBatch",
    "ImageList",
    "Instances",
    "Keypoints",
    "PolygonMasks",
    "RotatedBoxes",
    "heatmaps_to_keypoints",
    "keypoints_to_heatmap_targets",
    "matched_boxlist_iou",
    "nms_rotated",
    "pairwise_iou_rotated",
    "pad_to_divisibility",
    "pairwise_intersection",
    "pairwise_ioa",
    "pairwise_iou",
    "paste_masks_in_image",
    "polygons_to_bitmask",
    "rasterize_in_box",
]
