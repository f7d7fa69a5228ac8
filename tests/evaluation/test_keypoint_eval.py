"""COCO keypoint (OKS) evaluation tests.

The reference routes keypoints through pycocotools COCOeval with
iouType='keypoints' (coco_evaluation.py:106,516-538); cocoeval_np
re-implements computeOks and the keypoint params (maxDets [20], no
'small' area range, 10-entry stats)."""

import numpy as np

from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval


def _kp(x0, y0, step=1.0, vis=2.0, n=17):
    out = []
    for k in range(n):
        out += [x0 + k * step, y0 + k * step, vis]
    return out


def _gt(img, cat, bbox, kpts):
    return {
        "image_id": img, "category_id": cat, "bbox": list(bbox),
        "keypoints": kpts, "iscrowd": 0,
        "area": float(bbox[2] * bbox[3]),
    }


def _dt(img, cat, bbox, kpts, score):
    return {
        "image_id": img, "category_id": cat, "bbox": list(bbox),
        "keypoints": kpts, "score": score,
    }


def test_perfect_keypoints_ap_is_one():
    kp = _kp(10, 20)
    ev = COCOEval(
        [_gt(0, 1, (5, 15, 30, 30), kp)],
        [_dt(0, 1, (5, 15, 30, 30), kp, 0.9)],
        [0], [1], "keypoints",
    )
    ev.evaluate()
    stats = ev.summarize()
    assert stats.shape == (10,)
    np.testing.assert_allclose(stats[0], 1.0)
    np.testing.assert_allclose(stats[1], 1.0)  # AP50


def test_oks_matches_pycocotools_formula():
    kp = _kp(10, 20)
    kp_bad = [v + (8.0 if i % 3 != 2 else 0.0) for i, v in enumerate(kp)]
    gt = [_gt(0, 1, (5, 15, 30, 30), kp)]
    dt = [_dt(0, 1, (5, 15, 30, 30), kp_bad, 0.9)]
    ev = COCOEval(gt, dt, [0], [1], "keypoints")
    # computeOks: e = d^2 / (2*sigma)^2 / area / 2, OKS = mean(exp(-e)) over
    # visible keypoints (pycocotools cocoeval.py)
    oks = ev._compute_oks(ev._dts[(0, 1)], ev._gts[(0, 1)])[0, 0]
    var = (2.0 * COCOEval.KPT_OKS_SIGMAS) ** 2
    e = (8.0 ** 2 + 8.0 ** 2) / var / (900.0 + np.spacing(1)) / 2
    np.testing.assert_allclose(oks, np.mean(np.exp(-e)), rtol=1e-12)


def test_displaced_keypoints_rank_below_exact():
    """Two detections on one gt: the exact one must match at every OKS
    threshold, the displaced one becomes the FP."""
    kp = _kp(10, 20)
    kp_off = [v + (3.0 if i % 3 != 2 else 0.0) for i, v in enumerate(kp)]
    gt = [_gt(0, 1, (5, 15, 30, 30), kp)]
    dts = [
        _dt(0, 1, (5, 15, 30, 30), kp, 0.8),
        _dt(0, 1, (5, 15, 30, 30), kp_off, 0.9),  # higher score, worse OKS
    ]
    ev = COCOEval(gt, dts, [0], [1], "keypoints")
    ev.evaluate()
    stats = ev.summarize()
    # AP50: the displaced det (score .9) is a FP at rank 0 -> precision at
    # the single gt's recall=1 point is 0.5
    assert 0.0 < stats[1] <= 0.6, stats


def test_unlabeled_gt_is_ignored():
    kp_none = _kp(10, 20, vis=0.0)
    gt = [
        _gt(0, 1, (5, 15, 30, 30), _kp(10, 20)),
        _gt(0, 1, (60, 60, 20, 20), kp_none),  # num_keypoints == 0
    ]
    dt = [_dt(0, 1, (5, 15, 30, 30), _kp(10, 20), 0.9)]
    ev = COCOEval(gt, dt, [0], [1], "keypoints")
    ev.evaluate()
    stats = ev.summarize()
    np.testing.assert_allclose(stats[0], 1.0)  # the unlabeled gt is not a miss


def test_custom_sigmas():
    kp4 = _kp(10, 20, n=4)
    gt = [_gt(0, 1, (5, 15, 30, 30), kp4)]
    dt = [_dt(0, 1, (5, 15, 30, 30), kp4, 0.9)]
    ev = COCOEval(gt, dt, [0], [1], "keypoints", kpt_oks_sigmas=[0.05] * 4)
    ev.evaluate()
    assert ev.summarize()[0] == 1.0
