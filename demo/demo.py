#!/usr/bin/env python
"""Image/video/webcam demo CLI (reference ``demo/demo.py``)."""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.utils.logger import setup_logger
from predictor import VisualizationDemo


def setup_cfg(args):
    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.MODEL.CENTERNET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.RETINANET.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = args.confidence_threshold
    cfg.freeze()
    return cfg


def get_parser():
    parser = argparse.ArgumentParser(description="detectron2_centernet_tpu demo")
    parser.add_argument("--config-file", metavar="FILE", required=True)
    parser.add_argument("--input", nargs="+", help="image file(s) or glob")
    parser.add_argument("--video-input", help="video file path")
    parser.add_argument(
        "--webcam", action="store_true", help="read frames from camera 0"
    )
    parser.add_argument("--output", help="output dir or file")
    parser.add_argument("--confidence-threshold", type=float, default=0.5)
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    return parser


def main():
    args = get_parser().parse_args()
    logger = setup_logger(name="demo")
    logger.info("Arguments: %s", args)
    cfg = setup_cfg(args)
    demo = VisualizationDemo(cfg)

    if args.input:
        import cv2

        inputs = args.input
        if len(inputs) == 1:
            inputs = glob.glob(os.path.expanduser(inputs[0])) or inputs
        for path in inputs:
            img = cv2.imread(path)
            start = time.time()
            predictions, vis = demo.run_on_image(img)
            n = len(predictions["instances"]) if "instances" in predictions else 0
            logger.info("%s: %d instances in %.2fs", path, n, time.time() - start)
            if args.output:
                out = (
                    os.path.join(args.output, os.path.basename(path))
                    if os.path.isdir(args.output)
                    else args.output
                )
                vis.save(out)
    elif args.video_input or args.webcam:
        import cv2

        video = cv2.VideoCapture(args.video_input if args.video_input else 0)

        def frames():
            while True:
                ok, frame = video.read()
                if not ok:
                    break
                yield frame

        writer = None
        for _, vis in demo.run_on_video(frames()):
            if vis is None:
                continue
            if args.output:
                if writer is None:
                    h, w = vis.get_image().shape[:2]
                    writer = cv2.VideoWriter(
                        args.output, cv2.VideoWriter_fourcc(*"mp4v"),
                        video.get(cv2.CAP_PROP_FPS) or 30, (w, h),
                    )
                writer.write(vis.get_image()[:, :, ::-1])
            else:
                cv2.imshow("demo", vis.get_image()[:, :, ::-1])
                if cv2.waitKey(1) == 27:  # ESC
                    break
        video.release()
        if writer is not None:
            writer.release()


if __name__ == "__main__":
    main()
