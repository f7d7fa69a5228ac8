"""Panoptic Quality evaluation (reference
``detectron2/evaluation/panoptic_evaluation.py``, which defers to
panopticapi).  This environment has no panopticapi, so PQ/SQ/RQ are computed
directly from the published definition: segments match when same-category
IoU > 0.5 (unique by construction), PQ = sum(IoU of TPs) / (TP + FP/2 + FN/2).
"""

import logging
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["pq_compute_single_image", "PanopticEvaluator"]


def pq_compute_single_image(
    pan_gt: np.ndarray,  # (H, W) gt segment ids, 0 = void
    gt_segments: List[dict],  # {id, category_id, iscrowd?}
    pan_pred: np.ndarray,  # (H, W) predicted segment ids, 0 = void
    pred_segments: List[dict],  # {id, category_id}
) -> Dict[int, Dict[str, float]]:
    """Per-category {tp, fp, fn, iou_sum} for one image."""
    gt_by_id = {s["id"]: s for s in gt_segments}
    pred_by_id = {s["id"]: s for s in pred_segments}

    stats: Dict[int, Dict[str, float]] = {}

    def stat(cat):
        return stats.setdefault(cat, {"tp": 0, "fp": 0, "fn": 0, "iou_sum": 0.0})

    # joint histogram of (gt segment, pred segment) overlaps
    combined = pan_gt.astype(np.int64) * (pan_pred.max() + 2) + pan_pred.astype(np.int64)
    ids, counts = np.unique(combined, return_counts=True)
    inter: Dict[Tuple[int, int], int] = {}
    base = int(pan_pred.max() + 2)
    for v, c in zip(ids, counts):
        inter[(int(v // base), int(v % base))] = int(c)

    gt_area = {int(i): int(c) for i, c in zip(*np.unique(pan_gt, return_counts=True))}
    pred_area = {int(i): int(c) for i, c in zip(*np.unique(pan_pred, return_counts=True))}

    matched_gt, matched_pred = set(), set()
    for (gid, pid), c in inter.items():
        if gid == 0 or pid == 0 or gid not in gt_by_id or pid not in pred_by_id:
            continue
        g, p = gt_by_id[gid], pred_by_id[pid]
        if g["category_id"] != p["category_id"] or g.get("iscrowd", 0):
            continue
        union = gt_area[gid] + pred_area[pid] - c - inter.get((0, pid), 0) * 0
        iou = c / union if union > 0 else 0.0
        if iou > 0.5:
            s = stat(g["category_id"])
            s["tp"] += 1
            s["iou_sum"] += iou
            matched_gt.add(gid)
            matched_pred.add(pid)

    crowd_by_cat = {}
    for s in gt_segments:
        if s.get("iscrowd", 0):
            crowd_by_cat[s["category_id"]] = s["id"]
        elif s["id"] not in matched_gt:
            stat(s["category_id"])["fn"] += 1
    for s in pred_segments:
        pid = s["id"]
        if pid in matched_pred:
            continue
        # predictions mostly covered by void or same-class crowd don't count
        void_overlap = inter.get((0, pid), 0)
        crowd_id = crowd_by_cat.get(s["category_id"])
        if crowd_id is not None:
            void_overlap += inter.get((crowd_id, pid), 0)
        if pred_area.get(pid, 0) and void_overlap / pred_area[pid] > 0.5:
            continue
        stat(s["category_id"])["fp"] += 1
    return stats


class PanopticEvaluator:
    """Accumulates per-image PQ stats and reports PQ / SQ / RQ."""

    def __init__(self) -> None:
        self._stats: Dict[int, Dict[str, float]] = {}

    def reset(self) -> None:
        self._stats = {}

    def update(self, image_stats: Dict[int, Dict[str, float]]) -> None:
        for cat, s in image_stats.items():
            agg = self._stats.setdefault(cat, {"tp": 0, "fp": 0, "fn": 0, "iou_sum": 0.0})
            for k in s:
                agg[k] += s[k]

    def summarize(self) -> Dict[str, float]:
        pqs, sqs, rqs = [], [], []
        for cat, s in self._stats.items():
            tp, fp, fn = s["tp"], s["fp"], s["fn"]
            if tp + fp + fn == 0:
                continue
            sq = s["iou_sum"] / tp if tp else 0.0
            rq = tp / (tp + 0.5 * fp + 0.5 * fn)
            pqs.append(sq * rq)
            sqs.append(sq)
            rqs.append(rq)
        if not pqs:
            return {"PQ": float("nan"), "SQ": float("nan"), "RQ": float("nan")}
        out = {
            "PQ": 100 * float(np.mean(pqs)),
            "SQ": 100 * float(np.mean(sqs)),
            "RQ": 100 * float(np.mean(rqs)),
        }
        logger.info("Panoptic results: %s", out)
        return OrderedDict(out)
