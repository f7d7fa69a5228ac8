"""COCOEval correctness on hand-computed cases (the pycocotools-parity
contract the reference tests with tests/data/test_coco_evaluation.py)."""

import numpy as np

from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval, iou_xywh


def _gt(img, cat, bbox, iscrowd=0):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "iscrowd": iscrowd}


def _dt(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox), "score": score}


def test_iou_xywh_basic():
    d = np.array([[0, 0, 10, 10]], np.float64)
    g = np.array([[0, 0, 10, 10], [5, 0, 10, 10]], np.float64)
    iou = iou_xywh(d, g, [0, 0])
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 50.0 / 150.0)
    # crowd: intersection / det area
    iou_c = iou_xywh(d, g, [0, 1])
    np.testing.assert_allclose(iou_c[0, 1], 50.0 / 100.0)


def test_perfect_detection():
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10])],
        [_dt(1, 1, [0, 0, 10, 10], 0.9)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    assert stats[0] == 1.0  # AP
    assert stats[1] == 1.0  # AP50
    assert stats[8] == 1.0  # AR@100


def test_iou_half_overlap_only_counts_at_50():
    # det IoU exactly 0.5: matched at t=0.5 only -> AP = 1/10, AP50=1, AP75=0
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10])],
        [_dt(1, 1, [0, 0, 5, 10], 0.9)],  # inter 50, union 100
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[1], 1.0)  # AP50
    np.testing.assert_allclose(stats[2], 0.0)  # AP75
    np.testing.assert_allclose(stats[0], 0.1, atol=1e-6)


def test_false_positive_after_tp():
    # TP at score .9, FP at score .8 -> precision stays 1.0 up to recall 1.0
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10])],
        [_dt(1, 1, [0, 0, 10, 10], 0.9), _dt(1, 1, [50, 50, 10, 10], 0.8)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[1], 1.0)
    # FP before the TP instead -> AP50 = interpolated precision 0.5 everywhere
    ev2 = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10])],
        [_dt(1, 1, [0, 0, 10, 10], 0.8), _dt(1, 1, [50, 50, 10, 10], 0.9)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev2.evaluate()
    np.testing.assert_allclose(ev2.summarize()[1], 0.5)


def test_crowd_matches_are_ignored():
    # a det on a crowd region is neither TP nor FP; the remaining gt is found
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 1, [100, 100, 50, 50], iscrowd=1)],
        [_dt(1, 1, [0, 0, 10, 10], 0.9), _dt(1, 1, [110, 110, 30, 30], 0.8)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[0], 1.0)


def test_missed_gt_bounds_recall():
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 10, 10]), _gt(1, 1, [50, 50, 10, 10])],
        [_dt(1, 1, [0, 0, 10, 10], 0.9)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[8], 0.5)  # AR@100
    np.testing.assert_allclose(stats[1], 0.5, atol=0.01)  # AP50 ~ 0.5


def test_area_ranges():
    # one small (8x8=64 < 1024) and one large gt (200x200)
    ev = COCOEval(
        [_gt(1, 1, [0, 0, 8, 8]), _gt(1, 1, [300, 300, 200, 200])],
        [_dt(1, 1, [0, 0, 8, 8], 0.9), _dt(1, 1, [300, 300, 200, 200], 0.8)],
        img_ids=[1],
        cat_ids=[1],
    )
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[3], 1.0)  # APs
    np.testing.assert_allclose(stats[5], 1.0)  # APl
    assert stats[4] == -1.0  # no medium gts
