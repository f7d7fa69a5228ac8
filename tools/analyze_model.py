#!/usr/bin/env python
"""Model analysis CLI (reference ``tools/analyze_model.py``): parameter
counts, XLA FLOPs, module structure for a config."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.utils.analysis import (
    flop_count,
    parameter_count_table,
)
from detectron2_centernet_tpu.utils.logger import setup_logger

logger = setup_logger(name=__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument(
        "--tasks", nargs="+", default=["parameter"],
        choices=["flop", "parameter", "structure"],
    )
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = build_model(cfg)
    size = tuple(cfg.INPUT.TEST_SIZE)
    variables = model.init(jax.random.PRNGKey(0), size)

    for task in args.tasks:
        if task == "parameter":
            print(parameter_count_table(variables["params"]))
        elif task == "structure":
            print(jax.tree_util.tree_structure(variables["params"]))
        elif task == "flop":
            images = jnp.zeros((1, size[0], size[1], 3), jnp.float32)
            flops = flop_count(lambda im: model.predict_fn(variables, im), images)
            if flops is None:
                print("backend reports no flop estimate")
            else:
                print(f"inference flops: {flops / 1e9:.2f} GFLOPs/image")


if __name__ == "__main__":
    main()
