from .builtin_meta import get_builtin_metadata
from .coco import (
    convert_to_coco_dict,
    convert_to_coco_json,
    load_coco_json,
    register_coco_instances,
)

__all__ = [
    "convert_to_coco_dict",
    "convert_to_coco_json",
    "get_builtin_metadata",
    "load_coco_json",
    "register_coco_instances",
]
