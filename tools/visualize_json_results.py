#!/usr/bin/env python
"""Visualize detection results from a COCO-format results json
(reference ``tools/visualize_json_results.py``)."""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_centernet_tpu.data.detection_utils import read_image
from detectron2_centernet_tpu.structures import Boxes, Instances
from detectron2_centernet_tpu.utils.logger import setup_logger
from detectron2_centernet_tpu.utils.visualizer import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="COCO-format results json")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument("--dataset", default="coco_2017_val")
    parser.add_argument("--conf-threshold", type=float, default=0.5)
    args = parser.parse_args()
    logger = setup_logger(name=__name__)

    with open(args.input) as f:
        predictions = json.load(f)
    pred_by_image = defaultdict(list)
    for p in predictions:
        pred_by_image[p["image_id"]].append(p)

    metadata = MetadataCatalog.get(args.dataset)
    id_map = metadata.get("thing_dataset_id_to_contiguous_id")
    dicts = DatasetCatalog.get(args.dataset)
    os.makedirs(args.output, exist_ok=True)

    for d in dicts:
        preds = [
            p for p in pred_by_image.get(d["image_id"], [])
            if p["score"] >= args.conf_threshold
        ]
        if not preds:
            continue
        img = read_image(d["file_name"], "RGB")
        inst = Instances(img.shape[:2])
        boxes = np.asarray([p["bbox"] for p in preds], np.float32).reshape(-1, 4)
        boxes[:, 2:] += boxes[:, :2]  # XYWH -> XYXY
        inst.pred_boxes = Boxes(boxes)
        inst.scores = np.asarray([p["score"] for p in preds], np.float32)
        cls = [p["category_id"] for p in preds]
        if id_map:
            cls = [id_map.get(c, c) for c in cls]
        inst.pred_classes = np.asarray(cls, np.int64)
        vis = Visualizer(img, metadata).draw_instance_predictions(inst)
        out = os.path.join(args.output, os.path.basename(d["file_name"]))
        vis.save(out)
        logger.info("Saved %s", out)


if __name__ == "__main__":
    main()
