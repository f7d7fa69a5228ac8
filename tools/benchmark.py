#!/usr/bin/env python
"""Wall-clock benchmark harness (reference ``tools/benchmark.py``):
``--task data|train|eval`` measures dataloader-only, train-step, or
inference throughput for a config."""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data import (
    build_detection_test_loader,
    build_detection_train_loader,
)
from detectron2_centernet_tpu.engine import create_train_state, make_train_step
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.parallel import get_mesh, replicate, shard_batch
from detectron2_centernet_tpu.utils.logger import setup_logger

logger = setup_logger(name=__name__)


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def _fetch(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def benchmark_data(args):
    cfg = setup(args)
    loader = build_detection_train_loader(cfg)
    it = iter(loader)
    for _ in range(5):
        next(it)  # warmup
    timings = []
    for _ in range(args.num_iters):
        t0 = time.perf_counter()
        batch = next(it)
        timings.append(time.perf_counter() - t0)
    n = batch["image"].shape[0]
    logger.info(
        "Dataloader: %.4f s/batch (batch %d): %.1f img/s",
        np.mean(timings), n, n / np.mean(timings),
    )


def benchmark_train(args):
    cfg = setup(args)
    model = build_model(cfg)
    mesh = get_mesh(cfg.TPU.NUM_DEVICES, cfg.TPU.MESH_AXIS)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
    step = make_train_step(model, tx, mesh, cfg.TPU.MESH_AXIS)
    state = replicate(state, mesh)
    loader = build_detection_train_loader(cfg)
    it = iter(loader)

    def run_one():
        raw = next(it)
        batch = shard_batch(
            {k: raw[k] for k in ("image", "gt_boxes", "gt_classes", "gt_valid")},
            mesh, cfg.TPU.MESH_AXIS,
        )
        return step(state, batch)

    for _ in range(3):
        new_state, metrics = run_one()
        _fetch(metrics)
    t0 = time.perf_counter()
    for _ in range(args.num_iters):
        new_state, metrics = run_one()
    _fetch(metrics)
    dt = (time.perf_counter() - t0) / args.num_iters
    n = cfg.SOLVER.IMS_PER_BATCH
    logger.info("Train: %.4f s/iter, %.1f img/s", dt, n / dt)


def benchmark_eval(args):
    cfg = setup(args)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), tuple(cfg.INPUT.TEST_SIZE))
    predict = jax.jit(lambda images: model.predict_fn(variables, images))
    bs = max(1, cfg.TEST.BATCH_SIZE)
    h, w = cfg.INPUT.TEST_SIZE
    images = np.random.rand(bs, h, w, 3).astype(np.float32) * 255

    out = predict(images)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(args.num_iters):
        out = predict(images)
    _fetch(out)
    dt = (time.perf_counter() - t0) / args.num_iters
    logger.info("Eval: %.4f s/batch (batch %d), %.1f img/s", dt, bs, bs / dt)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="")
    parser.add_argument("--task", choices=["data", "train", "eval"], required=True)
    parser.add_argument("--num-iters", type=int, default=20)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    {"data": benchmark_data, "train": benchmark_train, "eval": benchmark_eval}[args.task](args)
