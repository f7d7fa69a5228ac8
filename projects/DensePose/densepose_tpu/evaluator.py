"""DensePose evaluation: COCO-style AP over GPS / GPSm similarity.

Reference: ``densepose/densepose_coco_evaluation.py`` (1157 lines) — the
full protocol is implemented here on top of the framework's COCOEval:

* **OGPS** per (detection, gt): gt-annotated points are mapped into the
  detection's IUV rasters; each point scores ``exp(-d^2 / (2 k_p^2))``
  with a PER-PART normalization ``k_p`` from the reference's published
  mean-geodesic table (``Mean_Distances`` over ``CoarseParts``,
  densepose_coco_evaluation.py:163-166); points predicted on the wrong
  part, or falling outside the detection box, contribute 0 but stay in
  the mean (reference :605-634 semantics).
* **GPSm**: ``sqrt(gps * mask_iou)`` with the fg-mask IoU between the
  detection's coarse segmentation and the gt's fg mask (reference
  :690,727).
* COCO matching/accumulation with the densepose params (maxDets [20], no
  "small" range, :1136-1144), gts without dp annotations ignored (:264),
  and the unmatched-detection fallback: a detection left unmatched whose
  box IoU with an ignored gt exceeds 0.8 inherits the ignore flag
  (:750-772) — so detections on un-annotated people are not penalized.

Known deviation (PARITY.md): the reference measures point-to-point
distances as SMPL *mesh geodesics* via downloadable data files
(``Pdist_matrix.pkl``, ~1 GB; ``SMPL_subdiv.mat``) that are external and
unavailable here.  The substitute is the same-part chart-space euclidean
distance, scaled so each part's ``k_p`` preserves the reference's
relative per-part weighting: ``k_p = K_CHART * Mean_Distances[coarse(p)]
/ Mean_Distances[torso]``.  Cross-part predictions score 0 (the geodesic
would be large but finite).
"""

import itertools
import logging
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from detectron2_centernet_tpu.data import DatasetCatalog
from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval, iou_xywh
from detectron2_centernet_tpu.evaluation.evaluator import DatasetEvaluator
from detectron2_centernet_tpu.parallel import comm

logger = logging.getLogger(__name__)

# Published per-coarse-part mean geodesic distances (reference
# densepose_coco_evaluation.py:163) and the fine->coarse part map (:165).
MEAN_DISTANCES = np.array(
    [0, 0.351, 0.107, 0.126, 0.237, 0.173, 0.142, 0.128, 0.150]
)
COARSE_PARTS = np.array(
    [0, 1, 1, 2, 2, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7, 8, 8]
)
# chart-space k for the torso; other parts scale by the geodesic table
K_CHART = 0.255
# per-fine-part k (index 0 unused; parts are 1..24)
K_PART = K_CHART * MEAN_DISTANCES[COARSE_PARTS] / MEAN_DISTANCES[1]


class DensePoseCOCOEval(COCOEval):
    """COCOEval with OGPS/GPSm in place of box IoU.

    dt records additionally carry ``dp_labels``/``dp_u``/``dp_v`` (S, S)
    rasters over the detection box (and optionally a precomputed
    ``mask_iou`` row is derived from dp_labels>0 vs the gt fg raster).
    gt records carry the dp_* point lists (+ optional ``dp_fg`` raster in
    gt-box frame for GPSm).
    """

    EXTRA_IOU_TYPES = ("densepose",)

    def __init__(self, gt_anns, dt_anns, img_ids, cat_ids, mode: str = "gps"):
        assert mode in ("gps", "gpsm")
        self.mode = mode
        for g in gt_anns:
            # reference :264: gts without dense annotations are ignored
            dp = g.get("dp_x")
            g["ignore"] = g.get("ignore", 0) or dp is None or len(dp) == 0
        super().__init__(gt_anns, dt_anns, img_ids, cat_ids, "densepose")
        self.MAX_DETS = (20,)
        self.AREA_RNG = {
            "all": (0.0, 1e10),
            "medium": (32.0 ** 2, 96.0 ** 2),
            "large": (96.0 ** 2, 1e10),
        }

    # -- similarity -----------------------------------------------------------
    @staticmethod
    def _ogps_one(gt, dt) -> float:
        """Mean per-point GPS of one (gt, dt) pair."""
        xs = np.asarray(gt["dp_x"], np.float64)
        if xs.size == 0:
            return 0.0
        ys = np.asarray(gt["dp_y"], np.float64)
        gi = np.asarray(gt["dp_I"], np.float64).astype(np.int64)
        gu = np.asarray(gt["dp_U"], np.float64)
        gv = np.asarray(gt["dp_V"], np.float64)
        gb = gt["bbox"]  # XYWH
        db = dt["bbox"]
        labels = np.asarray(dt["dp_labels"])
        s = labels.shape[0]
        # gt points: 255-normalized gt-box frame -> image -> dt raster grid
        xi = gb[0] + xs * gb[2] / 255.0
        yi = gb[1] + ys * gb[3] / 255.0
        gx = (xi - db[0]) / max(db[2], 1e-2) * s
        gy = (yi - db[1]) / max(db[3], 1e-2) * s
        inside = (gx >= 0) & (gx < s) & (gy >= 0) & (gy < s)
        ix = np.clip(gx.astype(np.int64), 0, s - 1)
        iy = np.clip(gy.astype(np.int64), 0, s - 1)
        pl = np.asarray(labels)[iy, ix].astype(np.int64)
        pu = np.asarray(dt["dp_u"])[iy, ix]
        pv = np.asarray(dt["dp_v"])[iy, ix]
        same = (pl == gi) & inside
        duv = np.sqrt((pu - gu) ** 2 + (pv - gv) ** 2)
        k = K_PART[np.clip(gi, 0, 24)]
        sims = np.where(
            same, np.exp(-(duv ** 2) / (2.0 * k ** 2)), 0.0
        )
        return float(sims.mean())

    @staticmethod
    def _mask_iou_one(gt, dt) -> float:
        """fg-mask IoU on a common image-space canvas: the detection's
        coarse fg (dp_labels > 0 over its box) vs the gt fg raster
        (``dp_fg`` over the gt box).  Resolution = the finer of the two."""
        fg_gt = gt.get("dp_fg")
        if fg_gt is None:
            return 1.0  # no gt mask: GPSm degrades to GPS (documented)
        fg_dt = np.asarray(dt["dp_labels"]) > 0
        gb, db = gt["bbox"], dt["bbox"]
        x0 = min(gb[0], db[0])
        y0 = min(gb[1], db[1])
        x1 = max(gb[0] + gb[2], db[0] + db[2])
        y1 = max(gb[1] + gb[3], db[1] + db[3])
        W = H = 128  # canvas resolution; both boxes resampled onto it

        def paste(mask, box):
            m = np.zeros((H, W), bool)
            bx = (box[0] - x0) / max(x1 - x0, 1e-2) * W
            by = (box[1] - y0) / max(y1 - y0, 1e-2) * H
            bw = box[2] / max(x1 - x0, 1e-2) * W
            bh = box[3] / max(y1 - y0, 1e-2) * H
            xi0, yi0 = int(round(bx)), int(round(by))
            xi1 = min(int(round(bx + bw)), W)
            yi1 = min(int(round(by + bh)), H)
            if xi1 <= xi0 or yi1 <= yi0:
                return m
            sh, sw = mask.shape
            ys = (np.arange(yi0, yi1) - by) / max(bh, 1e-2) * sh
            xs = (np.arange(xi0, xi1) - bx) / max(bw, 1e-2) * sw
            ys = np.clip(ys.astype(np.int64), 0, sh - 1)
            xs = np.clip(xs.astype(np.int64), 0, sw - 1)
            m[yi0:yi1, xi0:xi1] = np.asarray(mask, bool)[ys][:, xs]
            return m

        a = paste(fg_dt, db)
        b = paste(np.asarray(fg_gt, bool), gb)
        inter = (a & b).sum()
        union = (a | b).sum()
        return float(inter / union) if union else 0.0

    def _compute_iou(self, dts, gts, iscrowd) -> np.ndarray:
        ious = np.zeros((len(dts), len(gts)), np.float64)
        for j, gt in enumerate(gts):
            if gt["ignore"]:
                continue
            for i, dt in enumerate(dts):
                gps = self._ogps_one(gt, dt)
                if self.mode == "gpsm" and gps > 0:
                    gps = float(np.sqrt(gps * self._mask_iou_one(gt, dt)))
                ious[i, j] = gps
        return ious

    def summarize(self) -> np.ndarray:
        """Keypoint-style 10-entry stats (maxDets 20, no 'small' range)."""
        md = self.MAX_DETS[-1]
        self.stats = np.array(
            [
                self._summarize(True, max_dets=md),
                self._summarize(True, iou_thr=0.5, max_dets=md),
                self._summarize(True, iou_thr=0.75, max_dets=md),
                self._summarize(True, area="medium", max_dets=md),
                self._summarize(True, area="large", max_dets=md),
                self._summarize(False, max_dets=md),
                self._summarize(False, iou_thr=0.5, max_dets=md),
                self._summarize(False, iou_thr=0.75, max_dets=md),
                self._summarize(False, area="medium", max_dets=md),
                self._summarize(False, area="large", max_dets=md),
            ]
        )
        return self.stats

    def _post_match_ignore(self, dts, gts, g_ignore, dtm, gtm, dt_ignore):
        """Unmatched detection on an ignored gt with box IoU > 0.8 ->
        ignored (reference densepose_coco_evaluation.py:750-772)."""
        if not len(dts) or not len(gts):
            return
        d_boxes = np.array([d["bbox"] for d in dts], np.float64)
        g_boxes = np.array([g["bbox"] for g in gts], np.float64)
        ioub = iou_xywh(d_boxes, g_boxes, [int(g["iscrowd"]) for g in gts])
        T = dtm.shape[0]
        for dind in range(len(dts)):
            if dtm[-1, dind] != 0:
                continue
            best, m = 0.8, -1
            for gind in range(len(gts)):
                if gtm[-1, gind] > 0 and not gts[gind]["iscrowd"]:
                    continue
                if ioub[dind, gind] < best:
                    continue
                best, m = ioub[dind, gind], gind
            if m > -1 and g_ignore[m]:
                dt_ignore[:, dind] = True


class DensePoseEvaluator(DatasetEvaluator):
    """Per-rank process -> gather -> GPS + GPSm AP tables, plus direct
    point metrics (fine-part accuracy, mean same-part UV error) that are
    protocol-independent."""

    def __init__(self, dataset_name: str, iou_thresh: float = 0.5) -> None:
        self._dataset_name = dataset_name
        dicts = DatasetCatalog.get(dataset_name)
        self._img_ids = [int(d["image_id"]) for d in dicts]
        self._gt_anns: List[dict] = []
        for d in dicts:
            for a in d.get("annotations", []):
                g = {
                    "image_id": int(d["image_id"]),
                    "category_id": 1,
                    "bbox": list(map(float, a["bbox"])),
                    "iscrowd": int(a.get("iscrowd", 0)),
                }
                for k in ("dp_x", "dp_y", "dp_I", "dp_U", "dp_V"):
                    g[k] = a.get(k)
                if a.get("dp_masks") is not None:
                    from .data import _dp_mask_to_fg

                    g["dp_fg"] = _dp_mask_to_fg(a["dp_masks"], 64)
                elif a.get("dp_fg") is not None:
                    g["dp_fg"] = np.asarray(a["dp_fg"])
                self._gt_anns.append(g)
        self.reset()

    def reset(self) -> None:
        self._dt_anns: List[dict] = []
        self._part_correct = 0
        self._uv_err_sum = 0.0
        self._n_points = 0

    def process(self, inputs, outputs) -> None:
        for inp, out in zip(inputs, outputs):
            inst = out["instances"]
            if not hasattr(inst, "dp_labels") or len(inst) == 0:
                continue
            boxes = np.asarray(inst.pred_boxes.tensor, np.float64)
            scores = np.asarray(inst.scores, np.float64)
            for i in range(len(inst)):
                if i >= len(inst.dp_labels):
                    continue
                x0, y0, x1, y1 = boxes[i]
                self._dt_anns.append(
                    {
                        "image_id": int(inp["image_id"]),
                        "category_id": 1,
                        "bbox": [x0, y0, x1 - x0, y1 - y0],
                        "score": float(scores[i]),
                        "dp_labels": np.asarray(inst.dp_labels[i]),
                        "dp_u": np.asarray(inst.dp_u[i]),
                        "dp_v": np.asarray(inst.dp_v[i]),
                    }
                )
        self._accumulate_point_metrics(inputs, outputs)

    def _accumulate_point_metrics(self, inputs, outputs) -> None:
        by_img: Dict[int, List[dict]] = {}
        for g in self._gt_anns:
            by_img.setdefault(g["image_id"], []).append(g)
        for inp, out in zip(inputs, outputs):
            inst = out["instances"]
            if not hasattr(inst, "dp_labels") or len(inst) == 0:
                continue
            gts = [
                g
                for g in by_img.get(int(inp["image_id"]), [])
                if g["dp_x"] is not None and len(g["dp_x"]) > 0
            ]
            if not gts:
                continue
            boxes = np.asarray(inst.pred_boxes.tensor, np.float64)
            order = np.argsort(-np.asarray(inst.scores))
            g_xywh = np.array([g["bbox"] for g in gts], np.float64)
            taken = np.zeros(len(gts), bool)
            for di in order:
                if di >= len(inst.dp_labels):
                    continue
                db = boxes[di]
                dxywh = np.array([[db[0], db[1], db[2] - db[0], db[3] - db[1]]])
                ious = iou_xywh(dxywh, g_xywh, [0] * len(gts))[0]
                ious[taken] = -1
                gi = int(np.argmax(ious))
                if ious[gi] < 0.5:
                    continue
                taken[gi] = True
                gt = gts[gi]
                labels = np.asarray(inst.dp_labels[di])
                s = labels.shape[0]
                gb = gt["bbox"]
                xs = np.asarray(gt["dp_x"], np.float64)
                ys = np.asarray(gt["dp_y"], np.float64)
                parts = np.asarray(gt["dp_I"]).astype(np.int64)
                xi = gb[0] + xs * gb[2] / 255.0
                yi = gb[1] + ys * gb[3] / 255.0
                gx = (xi - db[0]) / max(db[2] - db[0], 1e-2) * s
                gy = (yi - db[1]) / max(db[3] - db[1], 1e-2) * s
                inside = (gx >= 0) & (gx < s) & (gy >= 0) & (gy < s)
                ix = np.clip(gx.astype(np.int64), 0, s - 1)
                iy = np.clip(gy.astype(np.int64), 0, s - 1)
                pl = labels[iy, ix].astype(np.int64)
                same = (pl == parts) & inside
                pu = np.asarray(inst.dp_u[di])[iy, ix]
                pv = np.asarray(inst.dp_v[di])[iy, ix]
                duv = np.sqrt(
                    (pu - np.asarray(gt["dp_U"])) ** 2
                    + (pv - np.asarray(gt["dp_V"])) ** 2
                )
                self._part_correct += int(same.sum())
                self._uv_err_sum += float(duv[same].sum())
                self._n_points += int(inside.sum())

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        comm.synchronize()
        all_dts = comm.gather(self._dt_anns)
        counts = comm.gather(
            (self._part_correct, self._uv_err_sum, self._n_points)
        )
        if not comm.is_main_process():
            return {}
        dts = list(itertools.chain(*all_dts))
        part_correct = sum(c[0] for c in counts)
        uv_err = sum(c[1] for c in counts)
        n_points = sum(c[2] for c in counts)

        res: Dict[str, float] = {}
        for mode in ("gps", "gpsm"):
            ev = DensePoseCOCOEval(
                [dict(g) for g in self._gt_anns], dts,
                self._img_ids, [1], mode=mode,
            )
            ev.evaluate()
            stats = ev.summarize()
            if mode == "gps":
                res["AP"] = float(stats[0] * 100)
                res["AP50"] = float(stats[1] * 100)
                res["AP75"] = float(stats[2] * 100)
                res["APm"] = float(stats[3] * 100)
                res["APl"] = float(stats[4] * 100)
            else:
                res["AP-gpsm"] = float(stats[0] * 100)
                res["AP50-gpsm"] = float(stats[1] * 100)
        res["part_accuracy"] = float(part_correct / max(n_points, 1) * 100)
        res["mean_uv_error"] = float(uv_err / max(part_correct, 1))
        res["n_points"] = int(n_points)
        logger.info("DensePose evaluation (chart-space GPS): %s", res)
        return OrderedDict({"densepose": res})
