#!/usr/bin/env python
"""DensePose inference CLI: dump packed results / render visualizations.

Counterpart of the reference's ``projects/DensePose/apply_net.py``: the two
user-facing actions on a trained model + images:

    python apply_net.py dump  <config.yaml> <weights> <images...> -v --output r.pkl
    python apply_net.py show  <config.yaml> <weights> <images...> dp_segm,bbox \\
        --min_score 0.8 --output out.png

``dump`` pickles, per image, the detection boxes/scores and the packed
``DensePoseResult`` (PNG-compressed IUV, structures.py); ``show`` renders
the chosen visualizers onto a grayscale copy of the image (reference
ShowAction semantics) and writes ``out.0001.png``-style files.
"""

import argparse
import logging
import os
import pickle
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
# running the script directly (not via an installed package): the repo root
# two levels up carries detectron2_centernet_tpu
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

from densepose_tpu import add_densepose_config  # noqa: E402
from densepose_tpu.structures import DensePoseResultExtractor  # noqa: E402
from densepose_tpu.vis import (  # noqa: E402
    CompoundVisualizer,
    DensePoseResultsContourVisualizer,
    DensePoseResultsFineSegmentationVisualizer,
    DensePoseResultsUVisualizer,
    DensePoseResultsVVisualizer,
    ScoredBoundingBoxVisualizer,
    create_extractor,
)

logger = logging.getLogger("apply_net")

VISUALIZERS = {
    "dp_contour": DensePoseResultsContourVisualizer,
    "dp_segm": DensePoseResultsFineSegmentationVisualizer,
    "dp_u": DensePoseResultsUVisualizer,
    "dp_v": DensePoseResultsVVisualizer,
    "bbox": ScoredBoundingBoxVisualizer,
}


def _setup(config_fpath, model_fpath, opts, min_score=None):
    from detectron2_centernet_tpu.config import get_cfg

    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.merge_from_file(config_fpath)
    if min_score is not None:
        opts = list(opts) + ["MODEL.ROI_HEADS.SCORE_THRESH_TEST", str(min_score)]
    if opts:
        cfg.merge_from_list(list(opts))
    if model_fpath:
        cfg.MODEL.WEIGHTS = model_fpath
    cfg.freeze()
    return cfg


def _predictor(cfg):
    from detectron2_centernet_tpu.engine import DefaultPredictor

    return DefaultPredictor(cfg)


def _out_fname(idx, template):
    base, ext = os.path.splitext(template)
    return f"{base}.{idx:04d}{ext}"


def dump_action(args):
    import cv2

    cfg = _setup(args.cfg, args.model, args.opts)
    predictor = _predictor(cfg)
    extractor = DensePoseResultExtractor()
    results = []
    for fname in args.input:
        img = cv2.imread(fname)  # BGR
        outputs = predictor(img)["instances"]
        entry = {"file_name": fname, "scores": np.asarray(outputs.scores)}
        entry["pred_boxes_XYXY"] = np.asarray(outputs.pred_boxes.tensor)
        dp, _ = extractor(outputs)
        entry["pred_densepose"] = dp
        results.append(entry)
        logger.info("Processed %s: %d detections", fname, len(outputs))
    out_dir = os.path.dirname(args.output)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(results, f)
    logger.info("Output saved to %s", args.output)


def show_action(args):
    import cv2

    cfg = _setup(args.cfg, args.model, args.opts, min_score=args.min_score)
    predictor = _predictor(cfg)
    vis_list = [VISUALIZERS[name]() for name in args.visualizations.split(",")]
    visualizer = CompoundVisualizer(vis_list)
    extractor = create_extractor(visualizer)
    for idx, fname in enumerate(args.input, start=1):
        img = cv2.imread(fname)
        outputs = predictor(img)["instances"]
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        canvas = np.tile(gray[:, :, None], (1, 1, 3))
        data = extractor(outputs)
        image_vis = visualizer.visualize(canvas, data)
        out_fname = _out_fname(idx, args.output)
        out_dir = os.path.dirname(out_fname)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(out_fname, image_vis)
        logger.info("Output saved to %s", out_fname)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="action", required=True)

    def common(p):
        p.add_argument("cfg", metavar="<config>")
        p.add_argument("model", metavar="<model>")
        p.add_argument("input", metavar="<input>", nargs="+")
        p.add_argument("--opts", default=[], nargs=argparse.REMAINDER)
        p.add_argument("-v", "--verbose", action="count", default=0)

    p_dump = sub.add_parser("dump", help="Dump model outputs to a file")
    common(p_dump)
    p_dump.add_argument("--output", default="results.pkl")
    p_dump.set_defaults(func=dump_action)

    p_show = sub.add_parser("show", help="Visualize selected entries")
    common(p_show)
    p_show.add_argument(
        "visualizations",
        help="comma-separated: [{}]".format(",".join(sorted(VISUALIZERS))),
    )
    p_show.add_argument("--min_score", type=float, default=0.8)
    p_show.add_argument("--output", default="outputres.png")
    p_show.set_defaults(func=show_action)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)
    args.func(args)


if __name__ == "__main__":
    main()
