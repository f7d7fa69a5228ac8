"""Run-length encoding for binary masks (the pycocotools `RLE` format,
column-major/Fortran order, uncompressed counts).

This environment has no pycocotools; these functions implement the same
on-disk json format (``{"size": [h, w], "counts": [...]}``) so exported
results remain consumable by standard COCO tooling, plus the mask-IoU used
by segm evaluation (crowd semantics included).
"""

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["mask_to_rle", "rle_to_mask", "rle_area", "rle_iou"]


def mask_to_rle(mask: np.ndarray) -> Dict:
    """(H, W) bool -> uncompressed COCO RLE (column-major counts starting
    with the zero run)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).reshape(h * w, order="F")
    # positions where value changes
    diff = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    runs = np.diff(np.concatenate([[0], diff, [flat.size]]))
    counts = runs.tolist()
    if flat.size and flat[0]:  # counts must start with a zero run
        counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": counts}


def rle_to_mask(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = rle["counts"]
    flat = np.zeros(h * w, bool)
    pos = 0
    val = False
    for c in counts:
        if val:
            flat[pos : pos + c] = True
        pos += c
        val = not val
    return flat.reshape((h, w), order="F")


def rle_area(rle: Dict) -> int:
    return int(sum(rle["counts"][1::2]))


def _run_starts(counts: Sequence[int]):
    """[(start, end)) intervals of the foreground runs."""
    out = []
    pos = 0
    val = False
    for c in counts:
        if val and c:
            out.append((pos, pos + c))
        pos += c
        val = not val
    return out


def rle_iou(dets: List[Dict], gts: List[Dict], iscrowd: Sequence[int]) -> np.ndarray:
    """Pairwise mask IoU (crowd gt -> intersection / det area), matching
    pycocotools ``maskUtils.iou`` semantics."""
    out = np.zeros((len(dets), len(gts)), np.float64)
    det_runs = [_run_starts(d["counts"]) for d in dets]
    gt_runs = [_run_starts(g["counts"]) for g in gts]
    det_areas = [rle_area(d) for d in dets]
    gt_areas = [rle_area(g) for g in gts]
    for i, dr in enumerate(det_runs):
        for j, gr in enumerate(gt_runs):
            inter = _interval_intersection(dr, gr)
            if iscrowd[j]:
                denom = det_areas[i]
            else:
                denom = det_areas[i] + gt_areas[j] - inter
            out[i, j] = inter / denom if denom > 0 else 0.0
    return out


def _interval_intersection(a, b) -> int:
    total = 0
    i = j = 0
    while i < len(a) and j < len(b):
        lo = max(a[i][0], b[j][0])
        hi = min(a[i][1], b[j][1])
        if hi > lo:
            total += hi - lo
        if a[i][1] < b[j][1]:
            i += 1
        else:
            j += 1
    return total
