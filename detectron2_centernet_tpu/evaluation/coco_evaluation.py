"""COCOEvaluator (reference ``detectron2/evaluation/coco_evaluation.py:29``).

Per-rank ``process`` converts predicted ``Instances`` to COCO-json records
(``instances_to_coco_json``, reference :321-354); ``evaluate`` gathers across
processes (reference :133-137 ``comm.gather``), optionally dumps the json, and
runs the in-repo COCO evaluation (``cocoeval_np.COCOEval`` — or the C++
accelerated path when built, mirroring ``use_fast_impl``/``COCOeval_opt``,
reference :40,496-538) producing the standard AP table.
"""

import copy
import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from ..data import DatasetCatalog, MetadataCatalog
from ..data.datasets.coco import convert_to_coco_json
from ..parallel import comm
from ..structures import BoxMode
from .cocoeval_np import COCOEval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["COCOEvaluator", "instances_to_coco_json"]


def instances_to_coco_json(instances, img_id: int) -> List[dict]:
    """Instances -> list of COCO-format detection dicts (reference :321-354);
    masks are encoded as uncompressed COCO RLE."""
    num_instance = len(instances)
    if num_instance == 0:
        return []
    boxes = np.asarray(instances.pred_boxes.tensor, np.float64).copy()
    # XYXY -> XYWH
    boxes[:, 2] -= boxes[:, 0]
    boxes[:, 3] -= boxes[:, 1]
    scores = np.asarray(instances.scores).tolist()
    classes = np.asarray(instances.pred_classes).tolist()
    has_mask = instances.has("pred_masks")
    if has_mask:
        from ..structures.rle import mask_to_rle

        rles = [mask_to_rle(np.asarray(m)) for m in instances.pred_masks]
    has_keypoints = instances.has("pred_keypoints")
    if has_keypoints:
        # reference :371-378: pixel-index convention, -0.5 on the coords
        kpts = np.asarray(instances.pred_keypoints, np.float64).copy()
        kpts[:, :, :2] -= 0.5
    results = []
    for k in range(num_instance):
        r = {
            "image_id": img_id,
            "category_id": classes[k],
            "bbox": boxes[k].tolist(),
            "score": scores[k],
        }
        if has_mask:
            r["segmentation"] = rles[k]
        if has_keypoints:
            r["keypoints"] = kpts[k].flatten().tolist()
        results.append(r)
    return results


class COCOEvaluator(DatasetEvaluator):
    def __init__(
        self,
        dataset_name: str,
        cfg=None,
        distributed: bool = True,
        output_dir: Optional[str] = None,
        use_fast_impl: bool = True,
    ) -> None:
        self._dataset_name = dataset_name
        self._distributed = distributed
        self._output_dir = output_dir
        self._use_fast_impl = use_fast_impl
        self._kpt_oks_sigmas = (
            list(cfg.TEST.KEYPOINT_OKS_SIGMAS)
            if cfg is not None and len(cfg.TEST.KEYPOINT_OKS_SIGMAS)
            else None
        )
        self._metadata = MetadataCatalog.get(dataset_name)
        self._predictions: List[dict] = []

        json_file = self._metadata.get("json_file")
        if json_file is None:
            # dataset not backed by a COCO json: convert it (reference :84-96)
            cache_path = os.path.join(
                output_dir or ".", f"{dataset_name}_coco_format.json"
            )
            convert_to_coco_json(dataset_name, cache_path)
            self._metadata.json_file = cache_path
            json_file = cache_path
        with open(json_file) as f:
            self._coco_gt = json.load(f)

    def reset(self) -> None:
        self._predictions = []

    def process(self, inputs: List[dict], outputs: List[dict]) -> None:
        for inp, out in zip(inputs, outputs):
            prediction = {"image_id": inp["image_id"]}
            if "instances" in out:
                prediction["instances"] = instances_to_coco_json(
                    out["instances"], inp["image_id"]
                )
            if len(prediction) > 1:
                self._predictions.append(prediction)

    def evaluate(self) -> Optional[Dict]:
        if self._distributed and comm.get_world_size() > 1:
            comm.synchronize()
            predictions = comm.gather(self._predictions, dst=0)
            predictions = list(itertools.chain(*predictions))
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions

        if len(predictions) == 0:
            logger.warning("[COCOEvaluator] Did not receive valid predictions.")
            return {"bbox": {"AP": float("nan")}}

        coco_results = list(itertools.chain(*[p["instances"] for p in predictions]))

        # contiguous class ids -> dataset category ids (reference :137-150)
        reverse_id_mapping = None
        if self._metadata.get("thing_dataset_id_to_contiguous_id") is not None:
            reverse_id_mapping = {
                v: k
                for k, v in self._metadata.thing_dataset_id_to_contiguous_id.items()
            }
        if reverse_id_mapping:
            coco_results = copy.deepcopy(coco_results)
            for r in coco_results:
                r["category_id"] = reverse_id_mapping[r["category_id"]]

        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            file_path = os.path.join(self._output_dir, "coco_instances_results.json")
            logger.info("Saving results to %s", file_path)
            with open(file_path, "w") as f:
                json.dump(coco_results, f)

        img_ids = [img["id"] for img in self._coco_gt["images"]]
        cat_ids = [c["id"] for c in self._coco_gt["categories"]]
        out = OrderedDict()
        coco_eval = self._evaluate_predictions_on_coco(
            self._coco_gt["annotations"], coco_results, img_ids, cat_ids
        )
        out["bbox"] = self._derive_coco_results(coco_eval)

        if any("segmentation" in r for r in coco_results):
            gt_segm = self._gt_segm_rles()
            dt_segm = [r for r in coco_results if "segmentation" in r]
            segm_eval = self._evaluate_predictions_on_coco(
                gt_segm, dt_segm, img_ids, cat_ids, iou_type="segm"
            )
            out["segm"] = self._derive_coco_results(segm_eval)

        if any("keypoints" in r for r in coco_results):
            gt_kp = [
                a for a in self._coco_gt["annotations"] if a.get("keypoints")
            ]
            dt_kp = [r for r in coco_results if "keypoints" in r]
            kp_eval = self._evaluate_predictions_on_coco(
                gt_kp, dt_kp, img_ids, cat_ids, iou_type="keypoints"
            )
            out["keypoints"] = self._derive_coco_results(
                kp_eval, iou_type="keypoints"
            )
        return out

    def _gt_segm_rles(self) -> List[dict]:
        """Ground-truth annotations with polygon segmentations rasterized to
        RLE at image size (the pycocotools annToRLE step)."""
        from ..structures.masks import polygons_to_bitmask
        from ..structures.rle import mask_to_rle

        sizes = {im["id"]: (im["height"], im["width"]) for im in self._coco_gt["images"]}
        out = []
        for a in self._coco_gt["annotations"]:
            segm = a.get("segmentation")
            if not segm:
                continue
            g = dict(a)
            if isinstance(segm, list):
                h, w = sizes[a["image_id"]]
                g["segmentation"] = mask_to_rle(polygons_to_bitmask(segm, h, w))
            out.append(g)
        return out

    def _evaluate_predictions_on_coco(self, gt_anns, coco_results, img_ids, cat_ids, iou_type="bbox"):
        if iou_type == "keypoints":
            # OKS sigmas come from cfg TEST.KEYPOINT_OKS_SIGMAS when given;
            # the numpy evaluator carries the COCO-17 defaults. The C++ fast
            # path covers bbox/segm only (like the reference's, which also
            # routes keypoints through pycocotools proper).
            sigmas = self._kpt_oks_sigmas
            nk = len(coco_results[0]["keypoints"]) // 3
            if sigmas is not None and len(sigmas) != nk:
                raise ValueError(
                    f"TEST.KEYPOINT_OKS_SIGMAS has {len(sigmas)} entries but "
                    f"predictions carry {nk} keypoints"
                )
            ev = COCOEval(
                gt_anns, coco_results, img_ids, cat_ids, iou_type,
                kpt_oks_sigmas=sigmas,
            )
            ev.evaluate()
            ev.summarize()
            return ev
        if self._use_fast_impl:
            try:
                from ..ops.fast_cocoeval import FastCOCOEval

                ev = FastCOCOEval(gt_anns, coco_results, img_ids, cat_ids, iou_type)
                ev.evaluate()
                ev.summarize()
                return ev
            except ImportError:
                pass
        ev = COCOEval(gt_anns, coco_results, img_ids, cat_ids, iou_type)
        ev.evaluate()
        ev.summarize()
        return ev

    def _derive_coco_results(self, coco_eval, iou_type="bbox") -> Dict[str, float]:
        metrics = (
            ["AP", "AP50", "AP75", "APm", "APl"]
            if iou_type == "keypoints"
            else ["AP", "AP50", "AP75", "APs", "APm", "APl"]
        )
        results = {
            metric: float(coco_eval.stats[idx] * 100)
            for idx, metric in enumerate(metrics)
        }
        logger.info(f"Evaluation results for {iou_type}:\n" + str(results))

        # per-category table (reference :262-300)
        thing_classes = self._metadata.get("thing_classes")
        if thing_classes is not None:
            per_cat = coco_eval.per_category_ap()
            id_map = self._metadata.get("thing_dataset_id_to_contiguous_id")
            for cat_id, ap in per_cat.items():
                idx = id_map[cat_id] if id_map else cat_id
                if 0 <= idx < len(thing_classes):
                    results["AP-" + thing_classes[idx]] = float(ap * 100)
        return results
