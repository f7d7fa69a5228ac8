#!/usr/bin/env python
"""TensorMask training CLI (reference projects/TensorMask/train_net.py)."""

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
from detectron2_centernet_tpu.evaluation import COCOEvaluator

from tensormask_tpu import add_tensormask_config  # noqa: F401 (registers arch)


class Trainer(DefaultTrainer):
    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        return COCOEvaluator(dataset_name, output_dir=cfg.OUTPUT_DIR)


def setup(args):
    cfg = get_cfg()
    add_tensormask_config(cfg)
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
        return Trainer.test(cfg, trainer.state)
    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(main, args.num_gpus, args=(args,))
