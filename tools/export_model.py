#!/usr/bin/env python
"""Export a trained model to a deployable StableHLO artifact.

The TPU-native analog of the reference's deploy entry point
(``tools/deploy/caffe2_converter.py``): take a config + weights, serialize
the jitted inference step, and (optionally) reload + smoke-run the artifact
to prove it is self-contained.  Where the reference emits Caffe2/ONNX/
TensorRT graphs, we emit portable StableHLO bytes that any PJRT runtime
(TPU serving, CPU, GPU) can execute without Python — weights are baked in
as constants, so the artifact is the whole deployment story.

Examples:
    python tools/export_model.py \\
        --config-file configs/CenterNet/ctdet_dla_34_1x.yaml \\
        --output /tmp/export MODEL.WEIGHTS /path/to/model.ckpt
    python tools/export_model.py --config-file ... --output out \\
        --batch-size 8 --int8 --run-smoke
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logger = logging.getLogger("export_model")


def setup_cfg(args):
    from detectron2_centernet_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    return cfg


def main() -> int:
    parser = argparse.ArgumentParser(
        description="Export a model to a StableHLO deployment artifact."
    )
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--output", required=True, help="output directory")
    parser.add_argument(
        "--format",
        choices=["stablehlo"],
        default="stablehlo",
        help="artifact format (StableHLO is the only TPU-native target)",
    )
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument(
        "--image-size",
        type=int,
        nargs=2,
        default=None,
        metavar=("H", "W"),
        help="input size; defaults to cfg.INPUT.TEST_SIZE",
    )
    parser.add_argument(
        "--int8",
        action="store_true",
        help="quantize conv/linear kernels to int8 (PTQ) before export",
    )
    parser.add_argument(
        "--run-smoke",
        action="store_true",
        help="reload the artifact and run one forward to validate it",
    )
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    logger.info("Command line arguments: %s", args)

    import jax

    from detectron2_centernet_tpu.checkpoint import DetectionCheckpointer
    from detectron2_centernet_tpu.export import (
        export_stablehlo,
        load_exported,
    )
    from detectron2_centernet_tpu.models import build_model

    cfg = setup_cfg(args)
    size = tuple(args.image_size) if args.image_size else tuple(cfg.INPUT.TEST_SIZE)

    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), size)
    if cfg.MODEL.WEIGHTS:
        variables = DetectionCheckpointer(variables).load(cfg.MODEL.WEIGHTS)
    else:
        logger.warning("MODEL.WEIGHTS is empty; exporting a random-init model.")

    if args.int8:
        from detectron2_centernet_tpu.export import (
            dequantize_variables,
            quantize_variables,
        )

        packed = quantize_variables(variables)
        variables = dequantize_variables(packed)
        logger.info("Applied int8 PTQ to conv/linear kernels.")

    os.makedirs(args.output, exist_ok=True)
    path = os.path.join(args.output, "model.stablehlo")
    blob = export_stablehlo(
        model, variables, batch_size=args.batch_size, image_size=size, path=path
    )
    meta = {
        "format": args.format,
        "meta_architecture": cfg.MODEL.META_ARCHITECTURE,
        "batch_size": args.batch_size,
        "image_size": list(size),
        "int8": bool(args.int8),
        "bytes": len(blob),
    }
    with open(os.path.join(args.output, "export_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(args.output, "config.yaml"), "w") as f:
        f.write(cfg.dump())
    logger.info("Wrote %d-byte artifact to %s", len(blob), path)

    if args.run_smoke:
        exported = load_exported(path)
        images = np.zeros((args.batch_size, size[0], size[1], 3), np.float32)
        out = exported(images)
        summary = {
            k: (tuple(np.asarray(v).shape), str(np.asarray(v).dtype))
            for k, v in out.items()
        }
        for k, (shape, dtype) in sorted(summary.items()):
            logger.info("smoke output %-12s shape=%s dtype=%s", k, shape, dtype)
        logger.info("Smoke run OK.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
