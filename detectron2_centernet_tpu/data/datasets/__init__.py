from .builtin_meta import get_builtin_metadata
from .coco import (
    convert_to_coco_dict,
    convert_to_coco_json,
    load_coco_json,
    register_coco_instances,
)
from .lvis import load_lvis_json, register_lvis_instances
from .pascal_voc import load_voc_instances, register_pascal_voc

__all__ = [
    "convert_to_coco_dict",
    "convert_to_coco_json",
    "get_builtin_metadata",
    "load_coco_json",
    "load_lvis_json",
    "load_voc_instances",
    "register_coco_instances",
    "register_lvis_instances",
    "register_pascal_voc",
]
