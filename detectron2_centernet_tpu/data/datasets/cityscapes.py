"""Cityscapes dataset loading (reference
``detectron2/data/datasets/cityscapes.py``), without the cityscapesscripts
dependency: instances parse the ``*_gtFine_polygons.json`` files directly;
semantic labels use the ``*_labelIds.png`` rasters with the standard
trainId mapping.
"""

import glob
import json
import logging
import os
from typing import List

import numpy as np

from ...structures import BoxMode
from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)

__all__ = ["load_cityscapes_instances", "load_cityscapes_semantic", "register_cityscapes"]

# the 8 "thing" classes (cityscapes labels with hasInstances=True)
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle", "bicycle",
]
# 19 trainId classes for semantic segmentation
CITYSCAPES_STUFF_CLASSES = [
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
]


def _files(image_dir: str, gt_dir: str):
    out = []
    for img in sorted(glob.glob(os.path.join(image_dir, "*", "*_leftImg8bit.png"))):
        city = os.path.basename(os.path.dirname(img))
        base = os.path.basename(img)[: -len("_leftImg8bit.png")]
        out.append(
            (
                img,
                os.path.join(gt_dir, city, base + "_gtFine_polygons.json"),
                os.path.join(gt_dir, city, base + "_gtFine_labelTrainIds.png"),
            )
        )
    return out


def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    dicts = []
    name_to_id = {n: i for i, n in enumerate(CITYSCAPES_THING_CLASSES)}
    for img_file, poly_file, _ in _files(image_dir, gt_dir):
        with open(poly_file) as f:
            ann = json.load(f)
        record = {
            "file_name": img_file,
            "image_id": os.path.basename(img_file),
            "height": ann["imgHeight"],
            "width": ann["imgWidth"],
        }
        objs = []
        for obj in ann["objects"]:
            label = obj["label"]
            if label.endswith("group"):  # crowd regions
                label = label[: -len("group")]
                iscrowd = 1
            else:
                iscrowd = 0
            if label not in name_to_id:
                continue
            poly = np.asarray(obj["polygon"], np.float64)
            if len(poly) < 3:
                continue
            objs.append(
                {
                    "category_id": name_to_id[label],
                    "bbox": [
                        float(poly[:, 0].min()), float(poly[:, 1].min()),
                        float(poly[:, 0].max()), float(poly[:, 1].max()),
                    ],
                    "bbox_mode": BoxMode.XYXY_ABS,
                    "segmentation": [poly.reshape(-1).tolist()],
                    "iscrowd": iscrowd,
                }
            )
        record["annotations"] = objs
        dicts.append(record)
    return dicts


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    dicts = []
    for img_file, _, label_file in _files(image_dir, gt_dir):
        dicts.append(
            {
                "file_name": img_file,
                "sem_seg_file_name": label_file,
                "image_id": os.path.basename(img_file),
                "height": 1024,
                "width": 2048,
            }
        )
    return dicts


def register_cityscapes(root: str) -> None:
    for split in ("train", "val", "test"):
        image_dir = os.path.join(root, "cityscapes", "leftImg8bit", split)
        gt_dir = os.path.join(root, "cityscapes", "gtFine", split)
        inst_name = f"cityscapes_fine_instance_seg_{split}"
        sem_name = f"cityscapes_fine_sem_seg_{split}"
        DatasetCatalog.register(
            inst_name,
            lambda i=image_dir, g=gt_dir: load_cityscapes_instances(i, g),
        )
        MetadataCatalog.get(inst_name).set(
            thing_classes=list(CITYSCAPES_THING_CLASSES),
            evaluator_type="cityscapes_instance",
            image_dir=image_dir,
            gt_dir=gt_dir,
        )
        DatasetCatalog.register(
            sem_name,
            lambda i=image_dir, g=gt_dir: load_cityscapes_semantic(i, g),
        )
        MetadataCatalog.get(sem_name).set(
            stuff_classes=list(CITYSCAPES_STUFF_CLASSES),
            evaluator_type="cityscapes_sem_seg",
            ignore_label=255,
            image_dir=image_dir,
            gt_dir=gt_dir,
        )
