"""LVIS evaluation (reference ``detectron2/evaluation/lvis_evaluation.py``).

This environment has neither the ``lvis`` package nor pycocotools, so AP is
computed with the in-repo COCOEval machinery configured LVIS-style:
maxDets=300 and no crowd regions.  The LVIS-specific "non-exhaustive
category" ignore rule is applied by marking detections of categories listed
in an image's ``neg_category_ids`` as ignored.
"""

import itertools
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from ..data import DatasetCatalog, MetadataCatalog
from ..parallel import comm
from .coco_evaluation import instances_to_coco_json
from .cocoeval_np import COCOEval
from .evaluator import DatasetEvaluator

logger = logging.getLogger(__name__)

__all__ = ["LVISEvaluator"]


class _LVISEval(COCOEval):
    MAX_DETS = (300,)

    def summarize(self) -> np.ndarray:
        self.stats = np.array(
            [
                self._summarize(True, max_dets=300),
                self._summarize(True, iou_thr=0.5, max_dets=300),
                self._summarize(True, iou_thr=0.75, max_dets=300),
                self._summarize(True, area="small", max_dets=300),
                self._summarize(True, area="medium", max_dets=300),
                self._summarize(True, area="large", max_dets=300),
            ]
        )
        return self.stats


class LVISEvaluator(DatasetEvaluator):
    def __init__(self, dataset_name: str, output_dir: Optional[str] = None) -> None:
        self._dataset_name = dataset_name
        self._metadata = MetadataCatalog.get(dataset_name)
        self._output_dir = output_dir
        self._predictions: List[dict] = []

    def reset(self) -> None:
        self._predictions = []

    def process(self, inputs, outputs) -> None:
        for inp, out in zip(inputs, outputs):
            if "instances" in out:
                self._predictions.append(
                    {
                        "image_id": inp["image_id"],
                        "instances": instances_to_coco_json(
                            out["instances"], inp["image_id"]
                        ),
                    }
                )

    def evaluate(self) -> Optional[Dict]:
        if comm.get_world_size() > 1:
            comm.synchronize()
            predictions = list(
                itertools.chain(*comm.gather(self._predictions, dst=0))
            )
            if not comm.is_main_process():
                return {}
        else:
            predictions = self._predictions
        if not predictions:
            return {"bbox": {"AP": float("nan")}}

        results = list(itertools.chain(*[p["instances"] for p in predictions]))
        for r in results:
            r["category_id"] += 1  # back to LVIS 1-indexed

        dataset_dicts = DatasetCatalog.get(self._dataset_name)
        gt_anns = []
        img_ids = []
        cat_ids = set()
        allowed = {}  # LVIS federated rule: categories evaluated per image
        for d in dataset_dicts:
            img_ids.append(d["image_id"])
            pos = set()
            for a in d["annotations"]:
                gt_anns.append(
                    {
                        "image_id": d["image_id"],
                        "category_id": a["category_id"] + 1,
                        "bbox": a["bbox"],
                        "iscrowd": 0,
                    }
                )
                cat_ids.add(a["category_id"] + 1)
                pos.add(a["category_id"] + 1)
            neg = {c for c in d.get("neg_category_ids", [])}
            if pos or neg:
                allowed[d["image_id"]] = pos | neg
        # detections of categories neither annotated nor known-absent on an
        # image are ignored, not false positives (LVIS federated protocol)
        if allowed:
            results = [
                r
                for r in results
                if r["category_id"] in allowed.get(r["image_id"], set())
            ]

        ev = _LVISEval(gt_anns, results, img_ids, sorted(cat_ids))
        ev.evaluate()
        stats = ev.summarize()
        out = {
            "AP": float(stats[0] * 100),
            "AP50": float(stats[1] * 100),
            "AP75": float(stats[2] * 100),
            "APs": float(stats[3] * 100),
            "APm": float(stats[4] * 100),
            "APl": float(stats[5] * 100),
        }
        out.update(self._frequency_breakdown(ev, sorted(cat_ids)))
        logger.info("LVIS bbox results: %s", out)
        return OrderedDict({"bbox": out})

    def _frequency_breakdown(self, ev, cat_ids) -> Dict[str, float]:
        """APr / APc / APf over the LVIS rare/common/frequent buckets
        (category ``frequency`` field captured by the dataset loader)."""
        freqs = self._metadata.get("class_frequencies")
        if not freqs or ev.eval is None:
            return {}
        # precision: (T, R, K, A, M); K follows cat_ids order
        prec = ev.eval["precision"][:, :, :, 0, -1]
        out = {}
        for key, bucket in (("APr", "r"), ("APc", "c"), ("APf", "f")):
            sel = [
                k
                for k, cid in enumerate(cat_ids)
                if 0 <= cid - 1 < len(freqs) and freqs[cid - 1] == bucket
            ]
            if not sel:
                continue
            s = prec[:, :, sel]
            valid = s[s > -1]
            out[key] = float(valid.mean() * 100) if valid.size else float("nan")
        return out
