"""DensePose test-time augmentation.

Counterpart of the reference's ``densepose/modeling/test_time_augmentation.py``
(``DensePoseGeneralizedRCNNWithTTA``): detections are merged across
multi-scale/flip variants, and the chart outputs of the variants are averaged
per merged detection.

TPU redesign + documented deviations:
- the reference re-runs the ROI heads on the merged boxes inside every
  augmented image, then averages the raw S/I/U/V tensors
  (test_time_augmentation.py:66-110).  Here each variant's jitted forward
  already produced box-frame IUV rasters for its own detections, so the
  merge matches variant detections to each kept box by IoU and averages in
  the shared box-relative frame — no second device pass, no recompile.
- horizontal-flip variants are un-mirrored with the hardcoded part-label
  symmetry table (``POINT_LABEL_SYMMETRIES``, reference structures.py:15);
  the within-part U/V symmetry lookup lives in an external .mat the
  reference downloads (structures.py:43-63), so flipped variants vote on
  part labels but are excluded from the U/V average.
- ``TEST.AUG.ROTATION_ANGLES`` is accepted but unsupported (the static
  letterbox family covers scales+flip); a non-empty value raises.
"""

from typing import Dict, Optional, Sequence

import numpy as np

from detectron2_centernet_tpu.models.test_time_augmentation import numpy_nms
from detectron2_centernet_tpu.structures import Boxes, Instances

from .data import load_for_dataset
from .structures import (  # noqa: F401  (re-exported reference names)
    MASK_LABEL_SYMMETRIES,
    POINT_LABEL_SYMMETRIES,
)

__all__ = [
    "DensePoseTTAPredictor",
    "DensePoseGeneralizedRCNNWithTTA",
    "flip_iuv_raster",
    "MASK_LABEL_SYMMETRIES",
    "POINT_LABEL_SYMMETRIES",
]

_PT_SYM = np.asarray(POINT_LABEL_SYMMETRIES, np.uint8)


def flip_iuv_raster(labels: np.ndarray, u: np.ndarray, v: np.ndarray,
                    transform_data=None):
    """Un-mirror a box-frame IUV raster predicted on an h-flipped image:
    mirror spatially + swap left/right part labels.  With
    ``transform_data`` (``DensePoseTransformData``, the external .mat
    chart-symmetry lookup) U/V values are remapped into the unflipped
    chart; without it they are only mirrored spatially and stay in the
    flipped chart — callers must treat them as label-vote-only."""
    labels_old = labels[..., ::-1]  # spatially un-mirrored, pre-swap labels
    u = u[..., ::-1]
    v = v[..., ::-1]
    if transform_data is not None:
        u, v = transform_data.apply_uv(labels_old, u, v)
    return _PT_SYM[labels_old], u, v


class DensePoseTTAPredictor:
    """Multi-scale + flip DensePose inference with chart-output averaging."""

    def __init__(
        self,
        cfg,
        model,
        variables,
        sizes: Optional[Sequence[int]] = None,
        flip: Optional[bool] = None,
        nms_thresh: float = 0.5,
        match_iou: float = 0.5,
        max_detections: Optional[int] = None,
        transform_data=None,
    ) -> None:
        import jax

        if transform_data is None:
            transform_data = load_for_dataset(cfg.DATASETS.TEST[0]) \
                if len(cfg.DATASETS.TEST) else None
        self.transform_data = transform_data

        if tuple(getattr(cfg.TEST.AUG, "ROTATION_ANGLES", ()) or ()):
            raise NotImplementedError(
                "rotation TTA is not supported by the static letterbox family"
            )
        self.model = model
        self.variables = variables
        sizes = list(sizes if sizes is not None else cfg.TEST.AUG.MIN_SIZES)
        div = int(getattr(model, "size_divisibility", 1) or 1)
        self.sizes = sorted({((sz + div - 1) // div) * div for sz in sizes})
        self.flip = bool(cfg.TEST.AUG.FLIP if flip is None else flip)
        self.nms_thresh = nms_thresh
        self.match_iou = match_iou
        self.max_detections = max_detections or cfg.TEST.DETECTIONS_PER_IMAGE
        self._predict = jax.jit(model.predict_fn)

    def __call__(self, image: np.ndarray) -> Dict[str, Instances]:
        from detectron2_centernet_tpu.data.detection_utils import (
            letterbox_and_flip_variants,
        )

        h, w = image.shape[:2]
        boxes_l, scores_l, classes_l = [], [], []
        labels_l, u_l, v_l, uv_ok_l = [], [], [], []
        for warped, m, flipped, size in letterbox_and_flip_variants(
            image, self.sizes, self.flip
        ):
            dets = self._predict(self.variables, warped[None])
            dets = {k: np.asarray(val) for k, val in dets.items()}
            out = self.model.postprocess(dets, [m], [(h, w)])[0]["instances"]
            if not hasattr(out, "dp_labels"):
                raise ValueError("model does not produce DensePose outputs")
            lab = np.asarray(out.dp_labels)
            uu = np.asarray(out.dp_u)
            vv = np.asarray(out.dp_v)
            if flipped:
                # postprocess un-mapped the box corners; the raster content
                # is still mirrored and left/right-swapped
                lab, uu, vv = flip_iuv_raster(lab, uu, vv, self.transform_data)
            boxes_l.append(np.asarray(out.pred_boxes.tensor))
            scores_l.append(np.asarray(out.scores))
            classes_l.append(np.asarray(out.pred_classes))
            labels_l.append(lab)
            u_l.append(uu)
            v_l.append(vv)
            uv_ok_l.append(
                np.full(len(out), not flipped or self.transform_data is not None,
                        bool)
            )

        boxes = np.concatenate(boxes_l) if boxes_l else np.zeros((0, 4), np.float32)
        scores = np.concatenate(scores_l) if scores_l else np.zeros(0, np.float32)
        classes = np.concatenate(classes_l) if classes_l else np.zeros(0, np.int64)
        labels = np.concatenate(labels_l) if labels_l else np.zeros((0, 1, 1), np.uint8)
        u = np.concatenate(u_l) if u_l else np.zeros((0, 1, 1), np.float32)
        v = np.concatenate(v_l) if v_l else np.zeros((0, 1, 1), np.float32)
        uv_ok = np.concatenate(uv_ok_l) if uv_ok_l else np.zeros(0, bool)

        keep = np.arange(0)
        if len(boxes):
            # Offset by the full coordinate span: TTA un-mapping can leave
            # (pre-clip) negative coordinates, and banding by max() alone
            # would let adjacent class bands overlap.
            span = boxes.max() - min(float(boxes.min()), 0.0) + 1.0
            offset = classes[:, None].astype(np.float64) * span
            keep = numpy_nms(boxes + offset, scores, self.nms_thresh)
            keep = keep[: self.max_detections]

        out_labels, out_u, out_v = [], [], []
        for i in keep:
            match = self._matches(boxes, classes, i)
            out = self._average(
                labels[match], u[match], v[match], uv_ok[match],
                primary=int(np.nonzero(match)[0].tolist().index(i)),
            )
            out_labels.append(out[0])
            out_u.append(out[1])
            out_v.append(out[2])

        inst = Instances((h, w))
        bx = Boxes(boxes[keep].astype(np.float32))
        bx.clip((h, w))
        inst.pred_boxes = bx
        inst.scores = scores[keep].astype(np.float32)
        inst.pred_classes = classes[keep].astype(np.int64)
        s = labels.shape[-1] if len(labels) else 1
        inst.dp_labels = (
            np.stack(out_labels) if out_labels else np.zeros((0, s, s), np.uint8)
        )
        inst.dp_u = np.stack(out_u) if out_u else np.zeros((0, s, s), np.float32)
        inst.dp_v = np.stack(out_v) if out_v else np.zeros((0, s, s), np.float32)
        return {"instances": inst}

    def _matches(self, boxes: np.ndarray, classes: np.ndarray, i: int) -> np.ndarray:
        """bool mask of detections matching box i (same class, IoU >= thr)."""
        b = boxes[i]
        x1 = np.maximum(b[0], boxes[:, 0])
        y1 = np.maximum(b[1], boxes[:, 1])
        x2 = np.minimum(b[2], boxes[:, 2])
        y2 = np.minimum(b[3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
            boxes[:, 3] - boxes[:, 1], 0
        )
        iou = inter / np.maximum(area[i] + area - inter, 1e-12)
        return (iou >= self.match_iou) & (classes == classes[i])

    @staticmethod
    def _average(labels, u, v, uv_ok, primary: int):
        """Pixelwise majority-vote labels; U/V averaged over unflipped
        variants that voted the winning label (fall back to the primary
        variant where none did)."""
        k, s, _ = labels.shape
        votes = np.zeros((25, s, s), np.int32)
        for j in range(k):
            np.add.at(votes, (labels[j].astype(np.int64),
                              np.arange(s)[:, None], np.arange(s)[None, :]), 1)
        win = votes.argmax(axis=0).astype(np.uint8)
        agree = (labels == win[None]) & uv_ok[:, None, None]
        cnt = agree.sum(axis=0)
        u_avg = np.where(
            cnt > 0,
            (u * agree).sum(axis=0) / np.maximum(cnt, 1),
            u[primary],
        )
        v_avg = np.where(
            cnt > 0,
            (v * agree).sum(axis=0) / np.maximum(cnt, 1),
            v[primary],
        )
        bg = win == 0
        u_avg[bg] = 0.0
        v_avg[bg] = 0.0
        return win, u_avg.astype(np.float32), v_avg.astype(np.float32)


# Reference-name alias (test_time_augmentation.py:36).
DensePoseGeneralizedRCNNWithTTA = DensePoseTTAPredictor
