"""COCO-format dataset loading — pure-json, no pycocotools dependency.

Contract match for the reference's ``detectron2/data/datasets/coco.py``:
``load_coco_json`` (:28) returns the standard list[dict] with
``file_name/height/width/image_id/annotations`` where each annotation carries
``bbox`` (XYWH_ABS), ``bbox_mode``, ``category_id`` (contiguous), ``iscrowd``,
``segmentation``/``keypoints`` when present; ``convert_to_coco_json`` (:412)
round-trips a registered dataset back to COCO json for evaluation.
"""

import contextlib
import io
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog
from ...structures import BoxMode

logger = logging.getLogger(__name__)

__all__ = ["load_coco_json", "register_coco_instances", "convert_to_coco_json", "convert_to_coco_dict"]


def load_coco_json(
    json_file: str,
    image_root: str,
    dataset_name: Optional[str] = None,
    extra_annotation_keys: Optional[List[str]] = None,
) -> List[dict]:
    """Load a COCO instance-annotation json into detectron2 dataset dicts."""
    with open(json_file) as f:
        coco = json.load(f)

    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_ids = [c["id"] for c in cats]
    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        thing_classes = [c["name"] for c in cats]
        meta.thing_classes = thing_classes
        id_map = {v: i for i, v in enumerate(cat_ids)}
        meta.thing_dataset_id_to_contiguous_id = id_map
        meta.json_file = json_file
        meta.image_root = image_root
    else:
        id_map = {v: i for i, v in enumerate(cat_ids)}

    imgs = {img["id"]: img for img in coco.get("images", [])}
    anns_per_img: Dict[int, List[dict]] = {img_id: [] for img_id in imgs}
    n_skipped = 0
    for ann in coco.get("annotations", []):
        img_id = ann["image_id"]
        if img_id not in anns_per_img:
            n_skipped += 1
            continue
        anns_per_img[img_id].append(ann)
    if n_skipped:
        logger.warning("%d annotations point at missing images; dropped", n_skipped)

    ann_keys = ["iscrowd", "bbox", "keypoints", "category_id"] + (extra_annotation_keys or [])
    dataset_dicts = []
    for img_id, img in sorted(imgs.items()):
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "height": img["height"],
            "width": img["width"],
            "image_id": img_id,
        }
        objs = []
        for ann in anns_per_img[img_id]:
            obj = {k: ann[k] for k in ann_keys if k in ann}
            segm = ann.get("segmentation")
            if segm:
                if isinstance(segm, dict):
                    obj["segmentation"] = segm  # RLE kept as-is
                else:
                    segm = [p for p in segm if len(p) % 2 == 0 and len(p) >= 6]
                    if not segm:
                        continue
                    obj["segmentation"] = segm
            kp = obj.get("keypoints")
            if kp:
                # reference (:148-156) shifts visible keypoint pixel coords
                # by 0.5 to the pixel-center convention
                obj["keypoints"] = [
                    v + 0.5 if i % 3 != 2 else v for i, v in enumerate(kp)
                ]
            obj["bbox_mode"] = BoxMode.XYWH_ABS
            obj["category_id"] = id_map[obj["category_id"]]
            objs.append(obj)
        record["annotations"] = objs
        dataset_dicts.append(record)
    return dataset_dicts


def register_coco_instances(name: str, metadata: dict, json_file: str, image_root: str) -> None:
    """Reference ``register_coco.py:16`` contract."""
    assert isinstance(name, str), name
    DatasetCatalog.register(name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco", **metadata
    )


def convert_to_coco_dict(dataset_name: str) -> dict:
    """Registered dataset -> COCO-format dict (reference coco.py:300-409)."""
    dataset_dicts = DatasetCatalog.get(dataset_name)
    metadata = MetadataCatalog.get(dataset_name)

    if hasattr(metadata, "thing_dataset_id_to_contiguous_id"):
        reverse_id_mapping = {
            v: k for k, v in metadata.thing_dataset_id_to_contiguous_id.items()
        }
    else:
        reverse_id_mapping = None

    categories = [
        {"id": reverse_id_mapping[i] if reverse_id_mapping else i, "name": name}
        for i, name in enumerate(metadata.thing_classes)
    ]
    coco_images = []
    coco_annotations = []
    for image_dict in dataset_dicts:
        coco_image = {
            "id": image_dict.get("image_id", len(coco_images)),
            "width": image_dict["width"],
            "height": image_dict["height"],
            "file_name": os.path.basename(image_dict.get("file_name", "")),
        }
        coco_images.append(coco_image)
        for annotation in image_dict.get("annotations", []):
            coco_annotation = {}
            bbox = annotation["bbox"]
            bbox_mode = annotation["bbox_mode"]
            bbox = BoxMode.convert(bbox, bbox_mode, BoxMode.XYWH_ABS)
            bbox = [round(float(x), 3) for x in bbox]
            area = (
                annotation["segmentation"]
                and _polygon_area(annotation["segmentation"])
                or bbox[2] * bbox[3]
                if "segmentation" in annotation
                else bbox[2] * bbox[3]
            )
            coco_annotation["id"] = len(coco_annotations) + 1
            coco_annotation["image_id"] = coco_image["id"]
            coco_annotation["bbox"] = bbox
            coco_annotation["area"] = float(area)
            coco_annotation["iscrowd"] = int(annotation.get("iscrowd", 0))
            coco_annotation["category_id"] = (
                reverse_id_mapping[annotation["category_id"]]
                if reverse_id_mapping
                else annotation["category_id"]
            )
            if "segmentation" in annotation:
                coco_annotation["segmentation"] = annotation["segmentation"]
            if "keypoints" in annotation:
                kp = np.asarray(annotation["keypoints"], np.float64).reshape(-1, 3)
                kp[:, :2] -= 0.5
                coco_annotation["keypoints"] = kp.reshape(-1).tolist()
                coco_annotation["num_keypoints"] = int((kp[:, 2] > 0).sum())
            coco_annotations.append(coco_annotation)

    return {
        "info": {"description": "Converted from a registered dataset."},
        "images": coco_images,
        "annotations": coco_annotations,
        "categories": categories,
        "licenses": None,
    }


def _polygon_area(segmentation) -> float:
    if isinstance(segmentation, dict):
        return 0.0
    area = 0.0
    for poly in segmentation:
        p = np.asarray(poly, np.float64).reshape(-1, 2)
        x, y = p[:, 0], p[:, 1]
        area += 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
    return area


def convert_to_coco_json(dataset_name: str, output_file: str, allow_cached: bool = True) -> None:
    if os.path.exists(output_file) and allow_cached:
        return
    coco_dict = convert_to_coco_dict(dataset_name)
    os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
    tmp = output_file + ".tmp"
    with open(tmp, "w") as f:
        json.dump(coco_dict, f)
    os.replace(tmp, output_file)
