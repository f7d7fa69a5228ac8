#!/usr/bin/env python
"""DensePose training CLI (reference projects/DensePose/train_net.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)

from densepose_tpu import (
    DensePoseDatasetMapper,
    DensePoseEvaluator,
    add_densepose_config,
)


class Trainer(DefaultTrainer):
    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        return DensePoseEvaluator(dataset_name)

    @classmethod
    def build_train_loader(cls, cfg):
        from detectron2_centernet_tpu.data import build_detection_train_loader

        return build_detection_train_loader(
            cfg, mapper=DensePoseDatasetMapper(cfg, is_train=True)
        )

    @classmethod
    def build_tta_predictor(cls, cfg, model, variables):
        """Chart-output-voting TTA (reference densepose/engine/trainer.py:
        Trainer.test_with_TTA builds DensePoseGeneralizedRCNNWithTTA)."""
        from densepose_tpu import DensePoseTTAPredictor

        return DensePoseTTAPredictor(cfg, model, variables)


def setup(args):
    cfg = get_cfg()
    add_densepose_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)
    if args.eval_only:
        trainer = Trainer(cfg)
        trainer.resume_or_load(resume=args.resume)
        res = Trainer.test(cfg, trainer)
        if cfg.TEST.AUG.ENABLED:
            res.update(
                {f"{k}_TTA": v for k, v in Trainer.test_with_TTA(cfg, trainer).items()}
            )
        return res
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, args=(args,))
