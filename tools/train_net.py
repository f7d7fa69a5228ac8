#!/usr/bin/env python
"""Canonical training CLI (reference ``tools/train_net.py``).

Examples:
    python tools/train_net.py --config-file configs/CenterNet/ctdet_dla_34_1x.yaml
    python tools/train_net.py --config-file ... --eval-only MODEL.WEIGHTS /path/ckpt
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data import MetadataCatalog
from detectron2_centernet_tpu.engine import (
    DefaultTrainer,
    default_argument_parser,
    default_setup,
    launch,
)
from detectron2_centernet_tpu.evaluation import COCOEvaluator, verify_results


class Trainer(DefaultTrainer):
    """Evaluator factory by dataset ``evaluator_type`` (reference
    train_net.py:46-103)."""

    @classmethod
    def build_evaluator(cls, cfg, dataset_name, output_folder=None):
        from detectron2_centernet_tpu.evaluation import (
            CityscapesInstanceEvaluator,
            CityscapesSemSegEvaluator,
            DatasetEvaluators,
            LVISEvaluator,
            PascalVOCDetectionEvaluator,
            SemSegEvaluator,
        )

        if output_folder is None:
            output_folder = os.path.join(cfg.OUTPUT_DIR, "inference")
        evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        evaluators = []
        if evaluator_type in ("coco", "coco_panoptic_seg"):
            evaluators.append(COCOEvaluator(dataset_name, output_dir=output_folder))
        if evaluator_type in ("sem_seg", "coco_panoptic_seg"):
            evaluators.append(SemSegEvaluator(dataset_name))
        if evaluator_type == "lvis":
            evaluators.append(LVISEvaluator(dataset_name, output_dir=output_folder))
        if evaluator_type == "pascal_voc":
            evaluators.append(PascalVOCDetectionEvaluator(dataset_name))
        if evaluator_type == "cityscapes_instance":
            evaluators.append(CityscapesInstanceEvaluator(dataset_name))
        if evaluator_type == "cityscapes_sem_seg":
            evaluators.append(CityscapesSemSegEvaluator(dataset_name))
        if not evaluators:
            raise NotImplementedError(
                f"No evaluator implemented for evaluator_type '{evaluator_type}' "
                f"(dataset {dataset_name})"
            )
        if len(evaluators) == 1:
            return evaluators[0]
        return DatasetEvaluators(evaluators)


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    if os.environ.get("DETECTRON2_SYNTH_DATA"):
        # dataset-free acceptance runs (dev/run_instant_tests.sh on CI/TPU
        # pods without COCO): replace missing datasets with synthetic scenes
        from detectron2_centernet_tpu.data.datasets.synthetic import (
            ensure_synthetic_datasets,
        )

        ensure_synthetic_datasets(tuple(cfg.DATASETS.TRAIN) + tuple(cfg.DATASETS.TEST))
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
        verify_results(cfg, res)
        return res

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(
        main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )
