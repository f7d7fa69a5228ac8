"""COCO json loading / conversion round trip (reference tests/data/test_coco.py)."""

import json
import os

import numpy as np
import pytest

from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog, register_coco_instances
from detectron2_centernet_tpu.data.datasets import convert_to_coco_dict, load_coco_json
from detectron2_centernet_tpu.structures import BoxMode


def _make_coco_json(tmp_path, n_images=3, n_annos=2):
    images, annotations = [], []
    aid = 1
    for i in range(n_images):
        images.append(
            {"id": i + 1, "width": 100 + i, "height": 80 + i, "file_name": f"img_{i}.jpg"}
        )
        for j in range(n_annos):
            annotations.append(
                {
                    "id": aid,
                    "image_id": i + 1,
                    "category_id": [7, 9][j % 2],
                    "bbox": [10.0 + j, 20.0, 30.0, 15.0],
                    "area": 450.0,
                    "iscrowd": 0,
                    "segmentation": [[10, 20, 40, 20, 40, 35, 10, 35]],
                }
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 7, "name": "cat"}, {"id": 9, "name": "dog"}],
    }
    path = os.path.join(tmp_path, "test.json")
    with open(path, "w") as f:
        json.dump(coco, f)
    return path


def test_load_coco_json(tmp_path):
    path = _make_coco_json(str(tmp_path))
    dicts = load_coco_json(path, "/img/root", dataset_name="_test_coco_load")
    assert len(dicts) == 3
    d = dicts[0]
    assert d["file_name"] == "/img/root/img_0.jpg"
    assert d["height"] == 80 and d["width"] == 100
    assert len(d["annotations"]) == 2
    a = d["annotations"][0]
    assert a["bbox_mode"] == BoxMode.XYWH_ABS
    # category ids remapped to contiguous [0, 1]
    assert {x["category_id"] for x in d["annotations"]} == {0, 1}
    meta = MetadataCatalog.get("_test_coco_load")
    assert meta.thing_classes == ["cat", "dog"]
    assert meta.thing_dataset_id_to_contiguous_id == {7: 0, 9: 1}


def test_register_and_convert_round_trip(tmp_path):
    path = _make_coco_json(str(tmp_path))
    name = "_test_coco_rt"
    register_coco_instances(name, {}, path, str(tmp_path))
    try:
        coco_dict = convert_to_coco_dict(name)
        assert len(coco_dict["images"]) == 3
        assert len(coco_dict["annotations"]) == 6
        # ids mapped back to the original dataset ids
        assert {c["id"] for c in coco_dict["categories"]} == {7, 9}
        for ann in coco_dict["annotations"]:
            assert ann["category_id"] in (7, 9)
            assert len(ann["bbox"]) == 4
    finally:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
