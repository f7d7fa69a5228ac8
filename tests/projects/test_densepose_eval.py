"""DensePose GPS/GPSm evaluation protocol tests (hand-computed values).

Covers the reference ``densepose_coco_evaluation.py`` protocol as
implemented by ``densepose_tpu.evaluator.DensePoseCOCOEval``: per-part k
normalization (the published Mean_Distances/CoarseParts tables), GPSm mask
combination, wrong-part/outside-box zeroing, the unannotated-gt ignore
rule, and the unmatched-detection box-IoU fallback."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose")
)

from densepose_tpu.evaluator import (  # noqa: E402
    COARSE_PARTS,
    K_PART,
    MEAN_DISTANCES,
    DensePoseCOCOEval,
    DensePoseEvaluator,
)


def _gt(img, bbox, parts, us, vs, n=2, **kw):
    """gt with n dp points spread across the box diagonal."""
    return dict(
        image_id=img, category_id=1, bbox=list(map(float, bbox)), iscrowd=0,
        dp_x=[255.0 * (i + 0.5) / n for i in range(n)],
        dp_y=[255.0 * (i + 0.5) / n for i in range(n)],
        dp_I=list(parts), dp_U=list(us), dp_V=list(vs), **kw,
    )


def _dt(img, bbox, gt, du=0.0, part_override=None, s=32, score=0.9):
    """dt whose IUV rasters reproduce the gt points (+du on U)."""
    labels = np.zeros((s, s), np.int64)
    u = np.zeros((s, s), np.float64)
    v = np.zeros((s, s), np.float64)
    for k in range(len(gt["dp_I"])):
        xi = gt["bbox"][0] + gt["dp_x"][k] * gt["bbox"][2] / 255.0
        yi = gt["bbox"][1] + gt["dp_y"][k] * gt["bbox"][3] / 255.0
        gx = int((xi - bbox[0]) / bbox[2] * s)
        gy = int((yi - bbox[1]) / bbox[3] * s)
        if 0 <= gx < s and 0 <= gy < s:
            labels[gy, gx] = (
                part_override if part_override is not None else gt["dp_I"][k]
            )
            u[gy, gx] = gt["dp_U"][k] + du
            v[gy, gx] = gt["dp_V"][k]
    return dict(
        image_id=img, category_id=1, bbox=list(map(float, bbox)), score=score,
        dp_labels=labels, dp_u=u, dp_v=v,
    )


def test_perfect_prediction_gps_one():
    gt = _gt(0, (8, 8, 40, 40), [3, 7], [0.25, 0.75], [0.5, 0.5])
    dt = _dt(0, (8, 8, 40, 40), gt)
    ev = DensePoseCOCOEval([gt], [dt], [0], [1], mode="gps")
    np.testing.assert_allclose(ev._ogps_one(gt, dt), 1.0)
    ev.evaluate()
    assert ev.summarize()[0] == 1.0


def test_per_part_k_table():
    """The same UV error scores differently on different parts: torso
    (part 1, coarse 1, k=0.255) forgives what the head (part 23/24,
    coarse 8, k=0.255*0.150/0.351) does not."""
    du = 0.10
    for part in (1, 23):
        gt = _gt(0, (0, 0, 64, 64), [part, part], [0.2, 0.6], [0.5, 0.5])
        dt = _dt(0, (0, 0, 64, 64), gt, du=du)
        ev = DensePoseCOCOEval([gt], [dt], [0], [1])
        k = K_PART[part]
        expect = float(np.exp(-(du ** 2) / (2 * k ** 2)))
        np.testing.assert_allclose(ev._ogps_one(gt, dt), expect, rtol=1e-12)
    # table sanity vs the published constants
    np.testing.assert_allclose(K_PART[1], 0.255)
    np.testing.assert_allclose(
        K_PART[23], 0.255 * MEAN_DISTANCES[COARSE_PARTS[23]] / 0.351
    )
    assert K_PART[23] < K_PART[1]


def test_wrong_part_scores_zero():
    gt = _gt(0, (0, 0, 64, 64), [3, 3], [0.25, 0.75], [0.5, 0.5])
    dt = _dt(0, (0, 0, 64, 64), gt, part_override=9)
    ev = DensePoseCOCOEval([gt], [dt], [0], [1])
    np.testing.assert_allclose(ev._ogps_one(gt, dt), 0.0)


def test_points_outside_detection_score_zero_but_count():
    """A detection covering half the gt box: the visible point is perfect,
    the out-of-box point contributes 0 -> mean 0.5."""
    gt = _gt(0, (0, 0, 64, 64), [3, 7], [0.25, 0.75], [0.5, 0.5])
    dt = _dt(0, (0, 0, 32, 32), gt)  # only the first diagonal point inside
    ev = DensePoseCOCOEval([gt], [dt], [0], [1])
    np.testing.assert_allclose(ev._ogps_one(gt, dt), 0.5)


def test_gpsm_combines_mask_iou():
    gt = _gt(0, (0, 0, 64, 64), [3, 7], [0.25, 0.75], [0.5, 0.5])
    # gt fg raster: left half of the gt box
    fg = np.zeros((64, 64), np.uint8)
    fg[:, :32] = 1
    gt["dp_fg"] = fg
    dt = _dt(0, (0, 0, 64, 64), gt)
    # dt fg = exactly the two labeled texels -> tiny IoU; use a full-box
    # fg instead for a clean half-overlap: labels>0 everywhere
    dt["dp_labels"] = np.maximum(dt["dp_labels"], 1)
    ev = DensePoseCOCOEval([dict(gt)], [dict(dt)], [0], [1], mode="gpsm")
    gps = ev._ogps_one(gt, dt)
    iou = ev._mask_iou_one(gt, dt)
    np.testing.assert_allclose(iou, 0.5, atol=0.02)  # half-box overlap
    got = ev._compute_iou([dt], [dict(gt, ignore=0)], [0])[0, 0]
    np.testing.assert_allclose(got, np.sqrt(gps * iou), rtol=1e-9)


def test_unannotated_gt_ignore_and_box_fallback():
    """Two people; only one has dp annotations.  A detection on the
    un-annotated one (box IoU > 0.8) must be IGNORED, not an FP -> AP 1.0
    (reference densepose_coco_evaluation.py:264,750-772)."""
    gt_a = _gt(0, (0, 0, 40, 40), [3, 7], [0.25, 0.75], [0.5, 0.5])
    gt_b = dict(
        image_id=0, category_id=1, bbox=[100.0, 100.0, 40.0, 40.0],
        iscrowd=0, dp_x=[], dp_y=[], dp_I=[], dp_U=[], dp_V=[],
    )
    dt_a = _dt(0, (0, 0, 40, 40), gt_a, score=0.8)
    dt_b = _dt(0, (101, 101, 40, 40), gt_a, score=0.9)  # on the ignored gt
    ev = DensePoseCOCOEval([gt_a, gt_b], [dt_a, dt_b], [0], [1])
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[0], 1.0)

    # without the fallback rule the higher-scored dt_b would be an FP at
    # every threshold, capping precision at the single recall point to 0.5
    class NoFallback(DensePoseCOCOEval):
        def _post_match_ignore(self, *a):
            pass

    ev2 = NoFallback([dict(gt_a), dict(gt_b)], [dt_a, dt_b], [0], [1])
    ev2.evaluate()
    assert ev2.summarize()[0] < 0.6


def test_full_evaluator_reports_gps_and_gpsm():
    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.structures import Boxes, Instances

    name = "dp_protocol_eval"
    anno = dict(
        bbox=[8.0, 8.0, 40.0, 40.0], bbox_mode=1, category_id=0, iscrowd=0,
        dp_x=[63.75, 191.25], dp_y=[63.75, 191.25], dp_I=[3, 7],
        dp_U=[0.25, 0.75], dp_V=[0.5, 0.5],
    )
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(
            name,
            lambda: [
                {"image_id": 1, "height": 64, "width": 64,
                 "file_name": "x.jpg", "annotations": [anno]}
            ],
        )
        MetadataCatalog.get(name).set(thing_classes=["person"])
    ev = DensePoseEvaluator(name)
    s = 32
    labels = np.zeros((s, s), np.uint8)
    u = np.zeros((s, s), np.float32)
    v = np.zeros((s, s), np.float32)
    for dx, dy, di, duv in [(63.75, 63.75, 3, 0.25), (191.25, 191.25, 7, 0.75)]:
        xi = 8 + dx * 40 / 255.0
        yi = 8 + dy * 40 / 255.0
        gx = int((xi - 8) / 40 * s)
        gy = int((yi - 8) / 40 * s)
        labels[gy, gx] = di
        u[gy, gx] = duv
        v[gy, gx] = 0.5
    inst = Instances((64, 64))
    inst.pred_boxes = Boxes(np.asarray([[8.0, 8.0, 48.0, 48.0]], np.float32))
    inst.scores = np.asarray([0.9], np.float32)
    inst.pred_classes = np.asarray([0], np.int64)
    inst.dp_labels = labels[None]
    inst.dp_u = u[None]
    inst.dp_v = v[None]
    ev.process([{"image_id": 1}], [{"instances": inst}])
    res = ev.evaluate()["densepose"]
    assert res["AP"] == 100.0
    assert res["AP-gpsm"] == 100.0  # no gt mask -> GPSm degrades to GPS
    assert res["part_accuracy"] == 100.0
