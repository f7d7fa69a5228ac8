"""Native cityscapes evaluators on hand-computable synthetic cases."""

import numpy as np

from detectron2_centernet_tpu.data.catalog import MetadataCatalog
from detectron2_centernet_tpu.evaluation import (
    CityscapesInstanceEvaluator,
    CityscapesSemSegEvaluator,
)
from detectron2_centernet_tpu.structures import Boxes, Instances


def _meta(name, things=("car", "person"), stuffs=None):
    meta = MetadataCatalog.get(name)
    meta.thing_classes = list(things)
    if stuffs is not None:
        meta.stuff_classes = list(stuffs)
    return meta


def _inst(h, w, boxes_masks):
    inst = Instances((h, w))
    masks, classes, scores = [], [], []
    bxs = []
    for cls, score, (y0, y1, x0, x1) in boxes_masks:
        m = np.zeros((h, w), bool)
        m[y0:y1, x0:x1] = True
        masks.append(m)
        classes.append(cls)
        scores.append(score)
        bxs.append([x0, y0, x1, y1])
    inst.pred_masks = np.stack(masks) if masks else np.zeros((0, h, w), bool)
    inst.pred_classes = np.asarray(classes, np.int64)
    inst.scores = np.asarray(scores, np.float32)
    inst.pred_boxes = Boxes(np.asarray(bxs, np.float32).reshape(-1, 4))
    return inst


def _gt_ann(cls, rect, h, w, iscrowd=0):
    y0, y1, x0, x1 = rect
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return {"category_id": cls, "segmentation": m, "iscrowd": iscrowd}


def test_perfect_prediction_gives_ap_100():
    _meta("cs_test_perfect")
    ev = CityscapesInstanceEvaluator("cs_test_perfect")
    h = w = 64
    rects = [(5, 30, 5, 30), (35, 60, 35, 60)]
    inputs = [{
        "image_id": "im0",
        "annotations": [_gt_ann(0, rects[0], h, w), _gt_ann(1, rects[1], h, w)],
    }]
    outputs = [{
        "instances": _inst(h, w, [(0, 0.9, rects[0]), (1, 0.8, rects[1])])
    }]
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert abs(res["segm"]["AP"] - 100.0) < 1e-6
    assert abs(res["segm"]["AP50"] - 100.0) < 1e-6


def test_miss_and_false_positive():
    _meta("cs_test_fp")
    ev = CityscapesInstanceEvaluator("cs_test_fp")
    h = w = 64
    gt = (5, 37, 5, 37)  # 32x32 gt
    inputs = [{"image_id": "im0", "annotations": [_gt_ann(0, gt, h, w)]}]
    # one perfect pred (score .9) + one disjoint FP (score .8): PR curve is
    # P=1@R=1 then P=0.5 -> all-point AP = 1.0 for threshold .5; class 1 has
    # no gt (nan, excluded)
    outputs = [{
        "instances": _inst(h, w, [(0, 0.9, gt), (0, 0.8, (40, 60, 40, 60))])
    }]
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert abs(res["segm"]["AP50"] - 100.0) < 1e-6
    # FP first (higher score) halves AP50: P at R=1 is 2/3 envelope... compute:
    ev2 = CityscapesInstanceEvaluator("cs_test_fp")
    ev2.process(inputs, [{
        "instances": _inst(h, w, [(0, 0.95, (40, 60, 40, 60)), (0, 0.8, gt)])
    }])
    res2 = ev2.evaluate()
    assert res2["segm"]["AP50"] < 100.0 - 1e-6


def test_crowd_void_rule_suppresses_fp():
    _meta("cs_test_crowd")
    ev = CityscapesInstanceEvaluator("cs_test_crowd")
    h = w = 64
    gt = (5, 37, 5, 37)
    crowd = (40, 64, 40, 64)
    inputs = [{
        "image_id": "im0",
        "annotations": [_gt_ann(0, gt, h, w),
                        _gt_ann(0, crowd, h, w, iscrowd=1)],
    }]
    # prediction fully inside the crowd region must not count as FP
    outputs = [{
        "instances": _inst(h, w, [(0, 0.9, gt), (0, 0.8, (42, 62, 42, 62))])
    }]
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert abs(res["segm"]["AP50"] - 100.0) < 1e-6


def test_min_region_size_ignored():
    _meta("cs_test_tiny")
    ev = CityscapesInstanceEvaluator("cs_test_tiny", min_region_size=100)
    h = w = 64
    inputs = [{"image_id": "im0",
               "annotations": [_gt_ann(0, (0, 5, 0, 5), h, w)]}]  # 25 px < 100
    outputs = [{"instances": _inst(h, w, [])}]
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert np.isnan(res["segm"]["AP"])  # no valid gt anywhere


def test_small_gt_absorbs_prediction():
    """A pred over a sub-min-size gt is ignored, not a false positive."""
    _meta("cs_test_small_absorb")
    h = w = 64
    big = (5, 37, 5, 37)
    tiny = (40, 48, 40, 48)  # 64 px < 100: unmatchable but an ignore region
    inputs = [{"image_id": "im0",
               "annotations": [_gt_ann(0, big, h, w), _gt_ann(0, tiny, h, w)]}]
    outputs = [{
        "instances": _inst(h, w, [(0, 0.9, big), (0, 0.8, tiny)])
    }]
    ev = CityscapesInstanceEvaluator("cs_test_small_absorb")
    ev.process(inputs, outputs)
    res = ev.evaluate()
    # with the tiny detection absorbed the curve is perfect
    assert abs(res["segm"]["AP"] - 100.0) < 1e-6


def test_crowd_absorption_is_class_restricted():
    """A pred inside an *other-class* crowd region still counts as FP."""
    _meta("cs_test_crowd_cls")
    h = w = 64
    gt = (5, 37, 5, 37)
    crowd = (40, 64, 40, 64)
    inputs = [{
        "image_id": "im0",
        "annotations": [_gt_ann(0, gt, h, w),
                        _gt_ann(1, crowd, h, w, iscrowd=1)],  # class 1 crowd
    }]
    # class-0 pred inside the class-1 crowd: NOT absorbed -> FP
    outputs = [{
        "instances": _inst(h, w, [(0, 0.9, gt), (0, 0.95, (42, 62, 42, 62))])
    }]
    ev = CityscapesInstanceEvaluator("cs_test_crowd_cls")
    ev.process(inputs, outputs)
    res = ev.evaluate()
    assert res["segm"]["AP50"] < 100.0 - 1e-6


def test_sem_seg_miou():
    _meta("cs_test_sem", stuffs=["road", "sky"])
    ev = CityscapesSemSegEvaluator("cs_test_sem")
    gt = np.zeros((8, 8), np.int64)
    gt[:, 4:] = 1
    gt[0, 0] = 255  # ignored
    pred = np.zeros((8, 8), np.int64)
    pred[:, 4:] = 1
    pred[:, 4] = 0  # 8 px of class1 predicted as class0
    ev.process([{"sem_seg": gt}], [{"sem_seg": pred}])
    res = ev.evaluate()
    iou0 = 31 / 39  # tp=31 (32 - ignored px), fp=8
    iou1 = 24 / 32
    assert abs(res["sem_seg"]["IoU"] - (iou0 + iou1) / 2 * 100) < 1e-6
