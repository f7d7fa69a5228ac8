"""Test-time augmentation (reference
``detectron2/modeling/test_time_augmentation.py``: ``DatasetMapperTTA`` :27
multi-scale+flip inputs, ``GeneralizedRCNNWithTTA`` :85 merged inference).

Static-shape version: every (scale, flip) variant is its own fixed-size
letterbox (one compiled program per size — sizes come from
``TEST.AUG.MIN_SIZES``, a small static set); per-variant detections are
un-warped to original coordinates and merged with host-side class-aware NMS.
Works with ANY meta-arch following the framework contract (CenterNet /
RetinaNet / R-CNN), not just R-CNN.
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import CfgNode
from ..structures import Boxes, Instances

__all__ = ["TTAPredictor", "GeneralizedRCNNWithTTA", "numpy_nms"]


def numpy_nms(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    """Greedy NMS on host; returns kept indices sorted by score."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / np.maximum(areas[i] + areas[order[1:]] - inter, 1e-12)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


class TTAPredictor:
    """Multi-scale + flip inference for any framework meta-arch."""

    def __init__(
        self,
        cfg: CfgNode,
        model,
        variables,
        sizes: Sequence[int] = None,
        flip: bool = None,
        nms_thresh: float = 0.5,
        max_detections: int = None,
    ) -> None:
        import jax

        self.model = model
        self.variables = variables
        sizes = list(sizes if sizes is not None else cfg.TEST.AUG.MIN_SIZES)
        # round each variant up to the model's size divisibility (CenterNet
        # DLA needs multiples of 32; reference ImageList does the same)
        div = int(getattr(model, "size_divisibility", 1) or 1)
        self.sizes = sorted({((sz + div - 1) // div) * div for sz in sizes})
        self.flip = bool(cfg.TEST.AUG.FLIP if flip is None else flip)
        self.nms_thresh = nms_thresh
        self.max_detections = max_detections or cfg.TEST.DETECTIONS_PER_IMAGE
        self._predict = jax.jit(model.predict_fn)

    def __call__(self, image: np.ndarray) -> Dict[str, Instances]:
        """image: (H, W, C) raw pixels (model's INPUT.FORMAT order)."""
        from ..data.detection_utils import letterbox_and_flip_variants

        h, w = image.shape[:2]
        all_boxes, all_scores, all_classes = [], [], []
        for warped, m, flipped, size in letterbox_and_flip_variants(
            image, self.sizes, self.flip
        ):
            dets = self._predict(self.variables, warped[None])
            dets = {k: np.asarray(v)[0] for k, v in dets.items()}
            out = self.model.postprocess(
                {k: v[None] for k, v in dets.items()}, [m], [(h, w)]
            )[0]["instances"]
            # the flip is composed into the warp matrix, so postprocess has
            # already un-mapped flipped boxes to original coordinates
            all_boxes.append(np.asarray(out.pred_boxes.tensor))
            all_scores.append(np.asarray(out.scores))
            all_classes.append(np.asarray(out.pred_classes))

        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0, np.float32)
        classes = np.concatenate(all_classes) if all_classes else np.zeros(0, np.int64)

        # class-aware merge via the offset trick
        if len(boxes):
            offset = classes[:, None].astype(np.float64) * (boxes.max() + 1.0)
            keep = numpy_nms(boxes + offset, scores, self.nms_thresh)
            keep = keep[: self.max_detections]
            boxes, scores, classes = boxes[keep], scores[keep], classes[keep]

        inst = Instances((h, w))
        bx = Boxes(boxes.astype(np.float32))
        bx.clip((h, w))
        inst.pred_boxes = bx
        inst.scores = scores.astype(np.float32)
        inst.pred_classes = classes.astype(np.int64)
        return {"instances": inst}


# Reference-name alias (test_time_augmentation.py:85): in this framework TTA
# is meta-arch-agnostic, so "GeneralizedRCNNWithTTA" is the same predictor.
GeneralizedRCNNWithTTA = TTAPredictor
