"""Cityscapes evaluation, natively implemented.

The reference (``detectron2/evaluation/cityscapes_evaluation.py``) writes
per-image pngs/txt and shells out to ``cityscapesscripts``
``evalInstanceLevelSemanticLabeling`` / ``evalPixelLevelSemanticLabeling``.
That package is not a dependency here; the evaluators below re-derive the
two protocols:

``CityscapesInstanceEvaluator`` — instance AP per the cityscapes protocol:
  * overlap thresholds 0.50:0.05:0.95 (AP = mean over thresholds & classes,
    AP50 also reported);
  * predictions ranked by confidence, greedy one-to-one matching per gt;
  * gt regions smaller than ``min_region_size`` (official default 100 px)
    are not matchable but become *ignore* regions — a prediction covering
    one is absorbed, not a false positive;
  * the per-class ignore set = same-class crowd ("group") regions plus
    sub-min-size same-class gt; unmatched predictions whose ignore-overlap
    fraction exceeds the overlap threshold are skipped (void-overlap rule,
    per ``evalInstanceLevelSemanticLabeling`` semantics);
  * AP from the all-point interpolated precision/recall curve.

``CityscapesSemSegEvaluator`` — pixel-level IoU over train classes with
ignore label 255 (same math the official pixel script reports as
"IoU classes").

Both consume the framework's standard eval-loop contract:
``process(inputs, outputs)`` with gt from the dataset dicts, so no files
are written and the evaluation runs identically under multi-process eval.
"""

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..parallel import comm
from ..structures.masks import polygons_to_bitmask
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["CityscapesInstanceEvaluator", "CityscapesSemSegEvaluator"]

_OVERLAPS = np.arange(0.5, 1.0, 0.05)
_MIN_REGION_SIZE = 100  # official minRegionSizes[0]


class CityscapesInstanceEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str, min_region_size: int = _MIN_REGION_SIZE):
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        self._min_region = int(min_region_size)
        self._gt_lookup = None
        self.reset()

    def reset(self):
        self._images = []  # per image: dict(preds=…, gts=…, crowd=…)

    def _gt_for(self, inp: dict):
        annos = inp.get("annotations")
        if annos is None:
            if self._gt_lookup is None:
                dicts = DatasetCatalog.get(self._dataset_name)
                self._gt_lookup = {d["image_id"]: d for d in dicts}
            annos = self._gt_lookup[inp["image_id"]].get("annotations", [])
        return annos

    def process(self, inputs: List[dict], outputs: List[dict]) -> None:
        for inp, out in zip(inputs, outputs):
            if "instances" not in out:
                continue
            inst = out["instances"]
            h, w = inst.image_size
            annos = self._gt_for(inp)
            gts, crowd_masks = [], []
            for a in annos:
                seg = a.get("segmentation")
                if seg is None:
                    continue
                mask = (
                    np.asarray(seg, bool)
                    if isinstance(seg, np.ndarray)
                    else polygons_to_bitmask(seg, h, w)
                )
                if a.get("iscrowd", 0):
                    crowd_masks.append((int(a["category_id"]), mask))
                else:
                    gts.append((int(a["category_id"]), mask))
            preds = []
            if len(inst):
                masks = (
                    np.asarray(inst.pred_masks)
                    if inst.has("pred_masks")
                    else np.zeros((len(inst), h, w), bool)
                )
                for i in range(len(inst)):
                    preds.append(
                        (
                            int(inst.pred_classes[i]),
                            float(inst.scores[i]),
                            masks[i].astype(bool),
                        )
                    )
            self._images.append(
                {"preds": preds, "gts": gts, "crowd": crowd_masks}
            )

    @staticmethod
    def _ap_from_curve(tp_flags: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
        if n_gt == 0:
            return float("nan")
        if len(scores) == 0:
            return 0.0
        order = np.argsort(-scores)
        tp = tp_flags[order].astype(np.float64)
        fp = 1.0 - tp
        tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
        recall = tp_c / n_gt
        precision = tp_c / np.maximum(tp_c + fp_c, 1e-9)
        # all-point interpolation: integrate the monotone precision envelope
        mrec = np.concatenate([[0.0], recall, [recall[-1]]])
        mpre = np.concatenate([[1.0], precision, [0.0]])
        for i in range(len(mpre) - 2, -1, -1):
            mpre[i] = max(mpre[i], mpre[i + 1])
        idx = np.nonzero(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    def evaluate(self) -> Optional[Dict]:
        if comm.get_world_size() > 1:
            comm.synchronize()
            images = list(
                itertools.chain(*comm.gather(self._images, dst=0))
            )
            if not comm.is_main_process():
                return {}
        else:
            images = self._images
        classes = self._metadata.get("thing_classes") or []
        n_cls = len(classes)
        ap_per_cls = np.full((n_cls, len(_OVERLAPS)), np.nan)
        for c in range(n_cls):
            for oi, thr in enumerate(_OVERLAPS):
                flags, scores, n_gt = [], [], 0
                for im in images:
                    cls_gts = [m for cls, m in im["gts"] if cls == c]
                    gts = [m for m in cls_gts if m.sum() >= self._min_region]
                    n_gt += len(gts)
                    # ignore set for class c: same-class crowd ("group")
                    # regions + same-class gt under the min region size
                    # (official evalInstanceLevelSemanticLabeling: a
                    # prediction mostly over these is absorbed, not an FP)
                    ignore_masks = [
                        m for cls, m in im["crowd"] if cls == c
                    ] + [m for m in cls_gts if m.sum() < self._min_region]
                    ignore = (
                        np.any(np.stack(ignore_masks), axis=0)
                        if ignore_masks
                        else None
                    )
                    preds = sorted(
                        [p for p in im["preds"] if p[0] == c],
                        key=lambda p: -p[1],
                    )
                    taken = np.zeros(len(gts), bool)
                    for _, score, pm in preds:
                        area = pm.sum()
                        if area == 0:
                            continue
                        best, best_iou = -1, thr
                        for gi, gm in enumerate(gts):
                            if taken[gi]:
                                continue
                            inter = np.logical_and(pm, gm).sum()
                            union = area + gm.sum() - inter
                            iou = inter / max(union, 1)
                            if iou > best_iou:
                                best, best_iou = gi, iou
                        if best >= 0:
                            taken[best] = True
                            flags.append(1.0)
                            scores.append(score)
                        else:
                            # void rule: unmatched predictions mostly inside
                            # the class ignore set are not false positives
                            if ignore is not None:
                                void = np.logical_and(pm, ignore).sum()
                                if void / area > thr:
                                    continue
                            flags.append(0.0)
                            scores.append(score)
                ap_per_cls[c, oi] = self._ap_from_curve(
                    np.asarray(flags), np.asarray(scores), n_gt
                )
        def _nanmean(a: np.ndarray) -> float:
            vals = a[np.isfinite(a)]
            return float(vals.mean()) if vals.size else float("nan")

        ap = _nanmean(ap_per_cls) * 100.0
        ap50 = _nanmean(ap_per_cls[:, 0]) * 100.0
        res = OrderedDict(
            {"segm": {"AP": ap, "AP50": ap50}}
        )
        for c, name in enumerate(classes):
            res["segm"][f"AP-{name}"] = _nanmean(ap_per_cls[c]) * 100.0
        logger.info("Cityscapes instance AP: %.2f  AP50: %.2f", ap, ap50)
        return res


class CityscapesSemSegEvaluator(DatasetEvaluator):
    """Pixel-level "IoU classes" with ignore label 255."""

    def __init__(self, dataset_name: str, num_classes: int = 19,
                 ignore_label: int = 255):
        self._metadata = MetadataCatalog.get(dataset_name)
        self._num_classes = int(
            len(self._metadata.get("stuff_classes") or []) or num_classes
        )
        self._ignore = int(ignore_label)
        self.reset()

    def reset(self):
        n = self._num_classes
        self._conf = np.zeros((n, n), np.int64)

    def process(self, inputs: List[dict], outputs: List[dict]) -> None:
        for inp, out in zip(inputs, outputs):
            if "sem_seg" not in out:
                continue
            pred = np.asarray(out["sem_seg"])
            if pred.ndim == 3:  # logits (C, H, W) or (H, W, C)
                pred = pred.argmax(0 if pred.shape[0] < pred.shape[-1] else -1)
            gt = np.asarray(inp["sem_seg"])
            valid = gt != self._ignore
            idx = gt[valid] * self._num_classes + pred[valid]
            self._conf += np.bincount(
                idx.astype(np.int64), minlength=self._num_classes ** 2
            ).reshape(self._num_classes, self._num_classes)

    def evaluate(self) -> Optional[Dict]:
        if comm.get_world_size() > 1:
            comm.synchronize()
            confs = comm.gather(self._conf, dst=0)
            if not comm.is_main_process():
                return {}
            self._conf = np.sum(confs, axis=0)
        tp = np.diag(self._conf).astype(np.float64)
        union = (
            self._conf.sum(0) + self._conf.sum(1) - np.diag(self._conf)
        ).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            iou = np.where(union > 0, tp / union, np.nan)
        miou = float(np.nanmean(iou)) * 100.0
        res = OrderedDict({"sem_seg": {"IoU": miou}})
        names = self._metadata.get("stuff_classes") or []
        for i, name in enumerate(names[: self._num_classes]):
            res["sem_seg"][f"IoU-{name}"] = float(iou[i]) * 100.0
        logger.info("Cityscapes mIoU: %.2f", miou)
        return res
