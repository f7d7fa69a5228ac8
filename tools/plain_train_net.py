#!/usr/bin/env python
"""Training script with no trainer abstraction (reference
``tools/plain_train_net.py``): the raw loop, for users who want full control.

Shows the primitive API: build model/optimizer/loader, jit one train step,
iterate, checkpoint, evaluate.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from detectron2_centernet_tpu.checkpoint import DetectionCheckpointer, PeriodicCheckpointer
from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data import (
    build_detection_test_loader,
    build_detection_train_loader,
)
from detectron2_centernet_tpu.engine import (
    create_train_state,
    default_argument_parser,
    default_setup,
    launch,
    make_train_step,
)
from detectron2_centernet_tpu.evaluation import COCOEvaluator, inference_on_dataset, print_csv_format
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.parallel import get_mesh, replicate, shard_batch
from detectron2_centernet_tpu.solver import build_lr_scheduler
from detectron2_centernet_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
)

logger = logging.getLogger("detectron2_centernet_tpu")


def do_test(cfg, model, state):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predict = jax.jit(lambda images: model.predict_fn(variables, images))
    results = {}
    for dataset_name in cfg.DATASETS.TEST:
        data_loader = build_detection_test_loader(cfg, dataset_name)
        evaluator = COCOEvaluator(dataset_name, output_dir=cfg.OUTPUT_DIR)
        results[dataset_name] = inference_on_dataset(
            predict, data_loader, evaluator, postprocess=model.postprocess,
            batch_size=max(1, cfg.TEST.BATCH_SIZE),
        )
        print_csv_format(results[dataset_name])
    return results


def do_train(cfg, resume=False):
    model = build_model(cfg)
    mesh = get_mesh(cfg.TPU.NUM_DEVICES, cfg.TPU.MESH_AXIS)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(max(cfg.SEED, 0)))
    train_step = make_train_step(model, tx, mesh, cfg.TPU.MESH_AXIS)
    schedule = build_lr_scheduler(cfg)

    checkpointer = DetectionCheckpointer(state, cfg.OUTPUT_DIR)
    start_iter = 0
    if resume and checkpointer.has_checkpoint():
        state = checkpointer.resume_or_load("", resume=True)
        start_iter = int(np.asarray(state.step))
    elif cfg.MODEL.WEIGHTS:
        state = checkpointer.load(cfg.MODEL.WEIGHTS, weights_only=True)
    state = replicate(state, mesh)

    max_iter = cfg.SOLVER.MAX_ITER
    periodic_checkpointer = PeriodicCheckpointer(
        checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, max_iter=max_iter
    )
    writers = [CommonMetricPrinter(max_iter), JSONWriter(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]

    data_loader = build_detection_train_loader(cfg)
    logger.info("Starting training from iteration %d", start_iter)
    with EventStorage(start_iter) as storage:
        it = iter(data_loader)
        for iteration in range(start_iter, max_iter):
            storage._iter = iteration
            raw = next(it)
            batch = shard_batch(
                {k: raw[k] for k in ("image", "gt_boxes", "gt_classes", "gt_valid")},
                mesh, cfg.TPU.MESH_AXIS,
            )
            state, metrics = train_step(state, batch)

            if (iteration + 1) % 20 == 0 or iteration == max_iter - 1:
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                if not np.isfinite(host["total_loss"]):
                    raise FloatingPointError(f"Loss diverged at {iteration}: {host}")
                storage.put_scalars(**host)
                storage.put_scalar("lr", float(np.asarray(schedule(iteration))), smoothing_hint=False)
                for writer in writers:
                    writer.write()
            if (
                cfg.TEST.EVAL_PERIOD > 0
                and (iteration + 1) % cfg.TEST.EVAL_PERIOD == 0
                and iteration != max_iter - 1
            ):
                do_test(cfg, model, state)
            periodic_checkpointer.step(iteration, state=state)
    return model, state


def main(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)

    if args.eval_only:
        model = build_model(cfg)
        state, _ = create_train_state(cfg, model, jax.random.PRNGKey(0))
        checkpointer = DetectionCheckpointer(state, cfg.OUTPUT_DIR)
        state = checkpointer.resume_or_load(cfg.MODEL.WEIGHTS, resume=args.resume)
        return do_test(cfg, model, state)

    model, state = do_train(cfg, resume=args.resume)
    return do_test(cfg, model, state)


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
