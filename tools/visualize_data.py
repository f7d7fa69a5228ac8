#!/usr/bin/env python
"""Visualize ground-truth of a dataset, raw or through the training mapper
(reference ``tools/visualize_data.py``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data import (
    DatasetCatalog,
    DatasetMapper,
    MetadataCatalog,
)
from detectron2_centernet_tpu.utils.logger import setup_logger
from detectron2_centernet_tpu.utils.visualizer import Visualizer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--source", choices=["annotation", "dataloader"], default="annotation")
    parser.add_argument("--output-dir", default="./")
    parser.add_argument("--show-count", type=int, default=10)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    args = parser.parse_args()
    logger = setup_logger(name=__name__)

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)

    dataset_name = cfg.DATASETS.TRAIN[0]
    metadata = MetadataCatalog.get(dataset_name)
    dicts = DatasetCatalog.get(dataset_name)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.source == "annotation":
        from detectron2_centernet_tpu.data.detection_utils import read_image

        for d in dicts[: args.show_count]:
            img = read_image(d["file_name"], "RGB")
            vis = Visualizer(img, metadata).draw_dataset_dict(d)
            out = os.path.join(args.output_dir, os.path.basename(d["file_name"]))
            vis.save(out)
            logger.info("Saved %s", out)
    else:
        mapper = DatasetMapper(cfg, is_train=True)
        rng = np.random.RandomState(0)
        for i, d in enumerate(dicts[: args.show_count]):
            ex = mapper(d, rng=rng)
            img = np.clip(ex["image"], 0, 255).astype(np.uint8)
            if cfg.INPUT.FORMAT == "BGR":
                img = img[:, :, ::-1]
            vis = Visualizer(img, metadata)
            from detectron2_centernet_tpu.structures import Boxes, Instances

            inst = Instances(img.shape[:2])
            valid = ex["gt_valid"]
            inst.pred_boxes = Boxes(ex["gt_boxes"][valid])
            inst.pred_classes = ex["gt_classes"][valid].astype(np.int64)
            inst.scores = np.ones(int(valid.sum()), np.float32)
            vis = vis.draw_instance_predictions(inst)
            out = os.path.join(args.output_dir, f"mapped_{i}.png")
            vis.save(out)
            logger.info("Saved %s", out)


if __name__ == "__main__":
    main()
