"""COCOEval pinned against an independently-derived loop oracle.

pycocotools is absent from this environment, so the strongest available
golden for the vectorized evaluator (``evaluation/cocoeval_np.py``) and the
C++ fast path (``ops/fast_cocoeval.py``) is an *independent re-derivation*
of the COCO evaluation protocol (the algorithm published with the COCO API:
greedy per-image matching at 10 IoU thresholds, crowd = ignore-matchable
with det-area denominator, area-range gt/dt ignores, 101-point interpolated
precision) written in the most literal dict-and-loop style possible, plus a
frozen stats vector so any future drift in either implementation is caught
even if both move together.  The fixture is a seeded multi-image /
multi-class scene with crowds, sub-range areas, duplicate and spurious
detections — the case mix the reference pins with pycocotools in
tests/data/test_coco_evaluation.py.
"""

import numpy as np
import pytest

from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREAS = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]
MAX_DETS = (1, 10, 100)


def _iou_one(d, g, crowd):
    """IoU of two XYWH boxes; crowd gt uses the det area as denominator."""
    ix0, iy0 = max(d[0], g[0]), max(d[1], g[1])
    ix1 = min(d[0] + d[2], g[0] + g[2])
    iy1 = min(d[1] + d[3], g[1] + g[3])
    inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
    da, ga = d[2] * d[3], g[2] * g[3]
    denom = da if crowd else da + ga - inter
    return inter / denom if denom > 0 else 0.0


def _match_img(gts, dts, arng, max_det):
    """The published per-image greedy matching, in literal loop form.

    Returns (dt_scores, dt_matched[T,D], dt_ignore[T,D], n_nonignored_gt)
    for the detections kept after score-sort + maxDet truncation.
    """
    gts = sorted(
        gts,
        key=lambda g: bool(
            g.get("iscrowd", 0)
            or g.get("ignore", 0)
            or not (arng[0] <= g["bbox"][2] * g["bbox"][3] <= arng[1])
        ),
    )
    g_ig = [
        bool(
            g.get("iscrowd", 0)
            or g.get("ignore", 0)
            or not (arng[0] <= g["bbox"][2] * g["bbox"][3] <= arng[1])
        )
        for g in gts
    ]
    dts = sorted(dts, key=lambda d: -d["score"])[:max_det]
    T, D, G = len(IOU_THRS), len(dts), len(gts)
    dt_matched = np.zeros((T, D), bool)
    dt_ignore = np.zeros((T, D), bool)
    for t, thr in enumerate(IOU_THRS):
        taken = [False] * G
        for di, d in enumerate(dts):
            best, m = min(thr, 1 - 1e-10), -1
            for gi, g in enumerate(gts):
                crowd = bool(g.get("iscrowd", 0))
                if taken[gi] and not crowd:
                    continue
                if m > -1 and not g_ig[m] and g_ig[gi]:
                    break  # gts are ignore-last; a real match can't improve
                iou = _iou_one(d["bbox"], g["bbox"], crowd)
                if iou < best:
                    continue
                best, m = iou, gi
            if m >= 0:
                taken[m] = True
                dt_matched[t, di] = True
                dt_ignore[t, di] = g_ig[m]
            else:
                area = d["bbox"][2] * d["bbox"][3]
                if not (arng[0] <= area <= arng[1]):
                    dt_ignore[t, di] = True
    return (
        np.array([d["score"] for d in dts], np.float64),
        dt_matched,
        dt_ignore,
        sum(1 for ig in g_ig if not ig),
    )


def oracle_stats(gt_anns, dt_anns, img_ids, cat_ids):
    """Full COCO accumulate + the 12-stat summary, re-derived with loops."""
    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREAS), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cat_ids):
        for a, arng in enumerate(AREAS):
            for m, max_det in enumerate(MAX_DETS):
                scores, matched, ignored, npig = [], [], [], 0
                seen_any = False
                for img in img_ids:
                    gts = [
                        g for g in gt_anns
                        if g["image_id"] == img and g["category_id"] == cat
                    ]
                    dts = [
                        d for d in dt_anns
                        if d["image_id"] == img and d["category_id"] == cat
                    ]
                    if not gts and not dts:
                        continue
                    seen_any = True
                    s, dm, dig, ng = _match_img(gts, dts, arng, max_det)
                    scores.append(s)
                    matched.append(dm)
                    ignored.append(dig)
                    npig += ng
                if not seen_any or npig == 0:
                    continue
                scores = np.concatenate(scores) if scores else np.zeros(0)
                order = np.argsort(-scores, kind="mergesort")
                dm = np.concatenate(matched, axis=1)[:, order]
                dig = np.concatenate(ignored, axis=1)[:, order]
                for t in range(T):
                    tp = fp = 0
                    pr_curve, rc_curve = [], []
                    for i in range(dm.shape[1]):
                        if dig[t, i]:
                            continue
                        if dm[t, i]:
                            tp += 1
                        else:
                            fp += 1
                        pr_curve.append(tp / (tp + fp))
                        rc_curve.append(tp / npig)
                    recall[t, k, a, m] = rc_curve[-1] if rc_curve else 0.0
                    for i in range(len(pr_curve) - 2, -1, -1):
                        pr_curve[i] = max(pr_curve[i], pr_curve[i + 1])
                    for ri, rthr in enumerate(REC_THRS):
                        pi = next(
                            (i for i, rc in enumerate(rc_curve) if rc >= rthr), None
                        )
                        precision[t, ri, k, a, m] = (
                            pr_curve[pi] if pi is not None else 0.0
                        )

    def _mean(s):
        v = s[s > -1]
        return float(v.mean()) if v.size else -1.0

    return np.array(
        [
            _mean(precision[:, :, :, 0, 2]),
            _mean(precision[IOU_THRS.searchsorted(0.5), :, :, 0, 2]),
            _mean(precision[np.isclose(IOU_THRS, 0.75).argmax(), :, :, 0, 2]),
            _mean(precision[:, :, :, 1, 2]),
            _mean(precision[:, :, :, 2, 2]),
            _mean(precision[:, :, :, 3, 2]),
            _mean(recall[:, :, 0, 0]),
            _mean(recall[:, :, 0, 1]),
            _mean(recall[:, :, 0, 2]),
            _mean(recall[:, :, 1, 2]),
            _mean(recall[:, :, 2, 2]),
            _mean(recall[:, :, 3, 2]),
        ]
    )


def _fixture():
    """Seeded multi-image / multi-class scene with every protocol wrinkle:
    crowd gts, small/medium/large areas, explicit ignores, duplicate dets,
    spurious dets (incl. in gt-free images), an all-miss category, >1
    candidate per gt, and score ties."""
    rng = np.random.RandomState(7)
    img_ids = list(range(1, 7))
    cat_ids = [1, 2, 3]
    gts, dts = [], []
    sizes = [8, 20, 48, 70, 120, 150]  # spans all three area buckets
    for img in img_ids:
        for cat in cat_ids[:2]:  # cat 3 has gt only in img 6
            n = rng.randint(0, 4)
            for _ in range(n):
                s = sizes[rng.randint(len(sizes))] * (0.8 + 0.4 * rng.rand())
                x, y = rng.rand(2) * 300
                g = {
                    "image_id": img,
                    "category_id": cat,
                    "bbox": [x, y, s, s * (0.7 + 0.6 * rng.rand())],
                    "iscrowd": int(rng.rand() < 0.2),
                }
                if rng.rand() < 0.1:
                    g["ignore"] = 1
                gts.append(g)
                # 0-2 candidate detections per gt, jittered
                for _ in range(rng.randint(0, 3)):
                    bx, by, bw, bh = g["bbox"]
                    j = 0.08 * rng.randn(4)
                    dts.append(
                        {
                            "image_id": img,
                            "category_id": cat,
                            "bbox": [
                                bx + j[0] * bw,
                                by + j[1] * bh,
                                max(2.0, bw * (1 + j[2])),
                                max(2.0, bh * (1 + j[3])),
                            ],
                            "score": float(np.round(rng.rand(), 2)),  # ties
                        }
                    )
        # spurious detections, any category
        for _ in range(rng.randint(0, 3)):
            s = sizes[rng.randint(len(sizes))]
            dts.append(
                {
                    "image_id": img,
                    "category_id": int(rng.choice(cat_ids)),
                    "bbox": [rng.rand() * 300, rng.rand() * 300, s, s],
                    "score": float(np.round(rng.rand(), 2)),
                }
            )
    gts.append({"image_id": 6, "category_id": 3, "bbox": [10, 10, 40, 40]})
    return gts, dts, img_ids, cat_ids


# stats from oracle_stats() on the seed-7 fixture, frozen 2026-08-17 so that
# coordinated drift of oracle+evaluator is also caught
_FROZEN = [
    0.18392, 0.36480, 0.21386, 0.07946, 0.36733, 0.34538,
    0.20833, 0.26667, 0.26667, 0.12500, 0.38333, 0.58750,
]


def test_oracle_matches_frozen():
    gts, dts, img_ids, cat_ids = _fixture()
    np.testing.assert_allclose(
        oracle_stats(gts, dts, img_ids, cat_ids), _FROZEN, atol=1e-5
    )


def test_cocoeval_matches_oracle():
    gts, dts, img_ids, cat_ids = _fixture()
    ev = COCOEval(gts, dts, img_ids=img_ids, cat_ids=cat_ids)
    ev.evaluate()
    got = ev.summarize()
    want = oracle_stats(gts, dts, img_ids, cat_ids)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_fast_cocoeval_matches_oracle():
    from detectron2_centernet_tpu.ops.fast_cocoeval import FastCOCOEval, load_library

    try:
        load_library()
    except Exception:
        pytest.skip("C++ extension unavailable")
    gts, dts, img_ids, cat_ids = _fixture()
    ev = FastCOCOEval(gts, dts, img_ids=img_ids, cat_ids=cat_ids)
    ev.evaluate()
    np.testing.assert_allclose(
        ev.summarize(), oracle_stats(gts, dts, img_ids, cat_ids), atol=1e-9
    )
