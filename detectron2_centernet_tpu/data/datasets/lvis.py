"""LVIS dataset loading (reference ``detectron2/data/datasets/lvis.py``).

LVIS json is COCO-shaped with extra per-image ``not_exhaustive_category_ids``
/ ``neg_category_ids`` fields and 1-indexed contiguous category ids; file
names are derived from ``coco_url``.
"""

import json
import logging
import os
from typing import List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

__all__ = ["load_lvis_json", "register_lvis_instances"]


def load_lvis_json(json_file: str, image_root: str, dataset_name: Optional[str] = None) -> List[dict]:
    with open(json_file) as f:
        lvis = json.load(f)

    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        cats = sorted(lvis["categories"], key=lambda c: c["id"])
        # LVIS ids are already contiguous 1..C
        meta.thing_classes = [c.get("synonyms", [c.get("name", "")])[0] for c in cats]
        # LVIS frequency buckets ('r'are / 'c'ommon / 'f'requent), used by the
        # evaluator for APr/APc/APf
        meta.class_frequencies = [c.get("frequency", "f") for c in cats]
        meta.json_file = json_file
        meta.image_root = image_root

    imgs = {img["id"]: img for img in lvis["images"]}
    anns_per_img = {i: [] for i in imgs}
    for ann in lvis["annotations"]:
        anns_per_img[ann["image_id"]].append(ann)

    dataset_dicts = []
    for img_id, img in sorted(imgs.items()):
        if "file_name" in img:
            file_name = os.path.join(image_root, img["file_name"])
        else:
            # derive from coco_url, e.g. ".../train2017/000000123.jpg"
            url = img["coco_url"]
            split_folder, file_name = url.split("/")[-2:]
            file_name = os.path.join(image_root, split_folder, file_name)
        record = {
            "file_name": file_name,
            "height": img["height"],
            "width": img["width"],
            "image_id": img_id,
            "not_exhaustive_category_ids": img.get("not_exhaustive_category_ids", []),
            "neg_category_ids": img.get("neg_category_ids", []),
        }
        objs = []
        for ann in anns_per_img[img_id]:
            objs.append(
                {
                    "bbox": ann["bbox"],
                    "bbox_mode": 1,  # XYWH_ABS
                    "category_id": ann["category_id"] - 1,  # 1-indexed -> 0
                    "segmentation": ann.get("segmentation", []),
                    "iscrowd": 0,
                }
            )
        record["annotations"] = objs
        dataset_dicts.append(record)
    return dataset_dicts


def register_lvis_instances(name: str, metadata: dict, json_file: str, image_root: str) -> None:
    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="lvis", **metadata
    )
