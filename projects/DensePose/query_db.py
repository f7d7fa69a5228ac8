#!/usr/bin/env python
"""Query DB: print / visualize entries of a registered dataset.

Counterpart of the reference's ``projects/DensePose/query_db.py``: pick
dataset entries with a field-selector expression and either pretty-print
them or render their GT dense-pose annotations onto the image:

    python query_db.py print <dataset> <selector> [--max-entries N]
    python query_db.py show  <dataset> <selector> <visualizations> \\
        [--output out.png] [--max-entries N]

``<selector>`` is ``*`` or ``field[:type]=value`` / ``field[:type]=min-max``
terms joined by commas (densepose_tpu/dbhelper.py); ``<visualizations>`` is
a comma list from: dp_segm, dp_i, dp_u, dp_v, dp_pts, bbox.  Images are
rendered on a grayscale copy, one output file per entry
(``out.0001.png`` ...), matching the reference ShowAction semantics.
"""

import argparse
import logging
import os
import sys
from timeit import default_timer as timer

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))

from densepose_tpu.dbhelper import EntrySelector  # noqa: E402
from densepose_tpu.structures import DensePoseDataRelative  # noqa: E402
from densepose_tpu.vis import (  # noqa: E402
    BoundingBoxVisualizer,
    CompoundVisualizer,
    DensePoseDataCoarseSegmentationVisualizer,
    DensePoseDataPointsIVisualizer,
    DensePoseDataPointsUVisualizer,
    DensePoseDataPointsVisualizer,
    DensePoseDataPointsVVisualizer,
)

logger = logging.getLogger("query_db")

VISUALIZERS = {
    "dp_segm": DensePoseDataCoarseSegmentationVisualizer,
    "dp_i": DensePoseDataPointsIVisualizer,
    "dp_u": DensePoseDataPointsUVisualizer,
    "dp_v": DensePoseDataPointsVVisualizer,
    "dp_pts": DensePoseDataPointsVisualizer,
    "bbox": BoundingBoxVisualizer,
}


def setup_dataset(dataset_name):
    from detectron2_centernet_tpu.data import DatasetCatalog

    logger.info("Loading dataset %s", dataset_name)
    start = timer()
    dataset = DatasetCatalog.get(dataset_name)
    logger.info("Loaded dataset %s in %.3fs", dataset_name, timer() - start)
    return dataset


def _selected_entries(args):
    dataset = setup_dataset(args.dataset)
    selector = EntrySelector.from_string(args.selector)
    count = 0
    for entry in dataset:
        if not selector(entry):
            continue
        yield entry
        count += 1
        if args.max_entries is not None and count >= args.max_entries:
            return


def do_print(args):
    import pprint

    printer = pprint.PrettyPrinter(indent=2, width=200, compact=True)
    for entry in _selected_entries(args):
        printer.pprint(entry)


def _extract_vis_data(vis_specs, entry):
    """Per spec: bbox list for 'bbox', (bbox list, dp data list) otherwise
    (reference query_db.py ShowAction._extract_data_for_visualizers_from_entry)."""
    from detectron2_centernet_tpu.structures import BoxMode

    bbox_list, dp_list = [], []
    for ann in entry.get("annotations", []):
        if not DensePoseDataRelative.validate_annotation(ann)[0]:
            continue
        box = np.asarray(ann["bbox"], np.float64)
        mode = ann.get("bbox_mode", BoxMode.XYWH_ABS)
        if mode != BoxMode.XYWH_ABS:
            box = BoxMode.convert(box[None], mode, BoxMode.XYWH_ABS)[0]
        bbox_list.append(box)
        dp_list.append(DensePoseDataRelative(ann))
    return [
        bbox_list if spec == "bbox" else (bbox_list, dp_list)
        for spec in vis_specs
    ]


def _out_fname(idx, template):
    base, ext = os.path.splitext(template)
    return f"{base}.{idx:04d}{ext}"


def do_show(args):
    import cv2

    vis_specs = args.visualizations.split(",")
    unknown = [s for s in vis_specs if s not in VISUALIZERS]
    if unknown:
        raise SystemExit(
            f"unknown visualizations {unknown}; choose from "
            f"{sorted(VISUALIZERS)}"
        )
    visualizer = CompoundVisualizer([VISUALIZERS[s]() for s in vis_specs])
    for idx, entry in enumerate(_selected_entries(args), start=1):
        image = cv2.imread(entry["file_name"], cv2.IMREAD_GRAYSCALE)
        if image is None:
            logger.warning("could not read %s", entry["file_name"])
            continue
        image = np.tile(image[:, :, None], (1, 1, 3))
        datas = _extract_vis_data(vis_specs, entry)
        image_vis = visualizer.visualize(image, datas)
        out_fname = _out_fname(idx, args.output)
        cv2.imwrite(out_fname, image_vis)
        logger.info("Output saved to %s", out_fname)


def create_argument_parser():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.set_defaults(func=lambda _args: parser.print_help(sys.stdout))
    sub = parser.add_subparsers(title="Actions")

    def common(p):
        p.add_argument("dataset", metavar="<dataset>", help="Dataset name")
        p.add_argument(
            "selector",
            metavar="<selector>",
            help="Entry selector: '*' or field1[:type]=value1[,"
            "field2[:type]=min-max...]",
        )
        p.add_argument(
            "--max-entries", metavar="N", type=int,
            help="Maximum number of entries to process",
        )
        p.add_argument("-v", "--verbosity", action="count")

    p_print = sub.add_parser("print", help="Output selected entries to stdout")
    common(p_print)
    p_print.set_defaults(func=do_print)

    p_show = sub.add_parser("show", help="Visualize selected entries")
    common(p_show)
    p_show.add_argument(
        "visualizations",
        metavar="<visualizations>",
        help="Comma-separated list from: [{}]".format(",".join(sorted(VISUALIZERS))),
    )
    p_show.add_argument(
        "--output", metavar="<image_file>", default="output.png",
        help="File name template to save outputs to",
    )
    p_show.set_defaults(func=do_show)
    return parser


def main():
    args = create_argument_parser().parse_args()
    verbosity = getattr(args, "verbosity", None)
    logging.basicConfig(
        level=logging.DEBUG if verbosity else logging.INFO, stream=sys.stdout
    )
    args.func(args)


if __name__ == "__main__":
    main()
