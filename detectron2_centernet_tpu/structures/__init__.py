from .boxes import Boxes, BoxMode, matched_boxlist_iou, pairwise_intersection, pairwise_ioa, pairwise_iou
from .image_batch import ImageBatch, pad_to_divisibility
from .instances import Instances

__all__ = [
    "Boxes",
    "BoxMode",
    "ImageBatch",
    "Instances",
    "matched_boxlist_iou",
    "pad_to_divisibility",
    "pairwise_intersection",
    "pairwise_ioa",
    "pairwise_iou",
]
