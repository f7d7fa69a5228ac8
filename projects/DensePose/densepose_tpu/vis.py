"""DensePose visualizers: IUV overlays, contours, boxes.

Counterpart of the reference's ``densepose/vis/`` package
(``base.py::MatrixVisualizer/BoundingBoxVisualizer`` and
``densepose.py::DensePoseResults*Visualizer``): every visualizer takes a
BGR uint8 image plus extracted data and returns the annotated image;
``CompoundVisualizer`` stacks several; ``create_extractor`` maps a
visualizer to the Instances-field extractor it needs.

Implementation is host-side numpy + cv2 (the data loader already depends
on cv2); the colormap is cv2's JET applied to the masked channel, alpha
blended inside the detection box only — the reference's
``MatrixVisualizer.visualize`` semantics (base.py:21-64).
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .structures import DensePoseResult, DensePoseResultExtractor

__all__ = [
    "MatrixVisualizer",
    "PointsVisualizer",
    "BoundingBoxVisualizer",
    "ScoredBoundingBoxVisualizer",
    "CompoundVisualizer",
    "DensePoseResultsFineSegmentationVisualizer",
    "DensePoseResultsUVisualizer",
    "DensePoseResultsVVisualizer",
    "DensePoseResultsContourVisualizer",
    "DensePoseDataCoarseSegmentationVisualizer",
    "DensePoseDataPointsVisualizer",
    "DensePoseDataPointsIVisualizer",
    "DensePoseDataPointsUVisualizer",
    "DensePoseDataPointsVVisualizer",
    "create_extractor",
]


def _colormap(gray: np.ndarray) -> np.ndarray:
    """(h, w) uint8 -> (h, w, 3) BGR via cv2 JET (import gated for CPU CI)."""
    import cv2

    return cv2.applyColorMap(gray, cv2.COLORMAP_JET)


class MatrixVisualizer:
    """Alpha-blend a colormapped matrix onto the image inside a box
    (reference vis/base.py:13-64)."""

    def __init__(self, inplace=True, alpha=0.7, val_scale=1.0):
        self.inplace = inplace
        self.alpha = alpha
        self.val_scale = val_scale

    def visualize(self, image_bgr, mask, matrix, bbox_xywh):
        image = image_bgr if self.inplace else image_bgr.copy()
        x, y, w, h = (int(round(t)) for t in bbox_xywh)
        if w <= 0 or h <= 0:
            return image
        h_img, w_img = image.shape[:2]
        # clip the box against the image, trimming the matrix by the same
        # amounts (boxes may extend past any edge)
        mx, my = max(-x, 0), max(-y, 0)
        x, y = max(x, 0), max(y, 0)
        w = min(w - mx, w_img - x, matrix.shape[1] - mx)
        h = min(h - my, h_img - y, matrix.shape[0] - my)
        if w <= 0 or h <= 0:
            return image
        matrix = matrix[my : my + h, mx : mx + w]
        mask = mask[my : my + h, mx : mx + w]
        gray = np.clip(matrix.astype(np.float64) * self.val_scale, 0, 255)
        colored = _colormap(gray.astype(np.uint8))
        region = image[y : y + h, x : x + w]
        blend = (
            region.astype(np.float64) * (1.0 - self.alpha)
            + colored.astype(np.float64) * self.alpha
        )
        region[mask > 0] = blend[mask > 0].astype(np.uint8)
        return image


class BoundingBoxVisualizer:
    """Plain box rectangles (reference vis/base.py:117-128)."""

    def __init__(self, color=(0, 255, 0), thickness=1):
        self.color = color
        self.thickness = thickness

    def visualize(self, image_bgr, boxes_xywh):
        import cv2

        if boxes_xywh is None:
            return image_bgr
        for x, y, w, h in np.asarray(boxes_xywh).reshape(-1, 4):
            cv2.rectangle(
                image_bgr,
                (int(x), int(y)),
                (int(x + w), int(y + h)),
                self.color,
                self.thickness,
            )
        return image_bgr


class ScoredBoundingBoxVisualizer(BoundingBoxVisualizer):
    """Boxes + score text (reference vis/base.py:131-160)."""

    def visualize(self, image_bgr, data):
        import cv2

        if data is None or data[0] is None:
            return image_bgr
        boxes_xywh, scores = data
        image_bgr = super().visualize(image_bgr, boxes_xywh)
        for (x, y, _, _), s in zip(np.asarray(boxes_xywh).reshape(-1, 4), scores):
            cv2.putText(
                image_bgr,
                f"{float(s):.3f}",
                (int(x), max(int(y) - 2, 0)),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.4,
                self.color,
                1,
            )
        return image_bgr


class CompoundVisualizer:
    """Apply several visualizers to their respective extracted data
    (reference vis/base.py:163-180)."""

    def __init__(self, visualizers: Sequence):
        self.visualizers = list(visualizers)

    def visualize(self, image_bgr, data: Sequence):
        assert len(data) == len(self.visualizers)
        for vis, d in zip(self.visualizers, data):
            image_bgr = vis.visualize(image_bgr, d)
        return image_bgr

    def __str__(self):
        return "Compound Visualizer [{}]".format(
            ", ".join(type(v).__name__ for v in self.visualizers)
        )


class _DensePoseResultsVisualizer:
    """Shared driver: decode each packed IUV result, hand the channel to
    the MatrixVisualizer (reference densepose.py:11-68)."""

    def __init__(self, inplace=True, alpha=0.7, val_scale=1.0):
        self.mask_visualizer = MatrixVisualizer(
            inplace=inplace, alpha=alpha, val_scale=val_scale
        )

    def visualize(self, image_bgr, densepose_result: Optional[DensePoseResult]):
        if densepose_result is None:
            return image_bgr
        for i in range(len(densepose_result)):
            (shape, data), bbox_xywh = densepose_result[i]
            iuv = DensePoseResult.decode_png_data(shape, data)
            image_bgr = self.visualize_iuv_arr(image_bgr, iuv, bbox_xywh)
        return image_bgr

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        raise NotImplementedError


class DensePoseResultsFineSegmentationVisualizer(_DensePoseResultsVisualizer):
    """Fine segmentation (24 chart parts) colormap (densepose.py:311-320)."""

    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(inplace, alpha, val_scale=255.0 / 24.0)

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        segm = iuv_arr[0]
        return self.mask_visualizer.visualize(image_bgr, segm > 0, segm, bbox_xywh)


class DensePoseResultsUVisualizer(_DensePoseResultsVisualizer):
    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(inplace, alpha, val_scale=1.0)

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        segm = iuv_arr[0]
        return self.mask_visualizer.visualize(
            image_bgr, segm > 0, iuv_arr[1], bbox_xywh
        )


class DensePoseResultsVVisualizer(_DensePoseResultsVisualizer):
    def __init__(self, inplace=True, alpha=0.7):
        super().__init__(inplace, alpha, val_scale=1.0)

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        segm = iuv_arr[0]
        return self.mask_visualizer.visualize(
            image_bgr, segm > 0, iuv_arr[2], bbox_xywh
        )


class DensePoseResultsContourVisualizer(_DensePoseResultsVisualizer):
    """U/V iso-contours: quantize each channel into ``levels`` bands and
    draw band boundaries (morphological gradient of the band image) — the
    cv2 analog of the reference's custom contour tracer
    (densepose.py:120-308)."""

    def __init__(self, levels=10, inplace=True, color=(53, 243, 116)):
        super().__init__(inplace)
        self.levels = levels
        self.color = np.array(color, np.uint8)

    def visualize_iuv_arr(self, image_bgr, iuv_arr, bbox_xywh):
        import cv2

        x, y, w, h = (int(round(t)) for t in bbox_xywh)
        h_img, w_img = image_bgr.shape[:2]
        mx, my = max(-x, 0), max(-y, 0)
        x, y = max(x, 0), max(y, 0)
        w = min(w - mx, w_img - x, iuv_arr.shape[2] - mx)
        h = min(h - my, h_img - y, iuv_arr.shape[1] - my)
        if w <= 0 or h <= 0:
            return image_bgr
        segm = iuv_arr[0, my : my + h, mx : mx + w]
        kernel = np.ones((3, 3), np.uint8)
        region = image_bgr[y : y + h, x : x + w]
        for chan in (1, 2):
            bands = (
                iuv_arr[chan, my : my + h, mx : mx + w].astype(np.int32)
                * self.levels // 256
            ).astype(np.uint8)
            edges = cv2.morphologyEx(bands, cv2.MORPH_GRADIENT, kernel) > 0
            region[(segm > 0) & edges] = self.color
        return image_bgr


class PointsVisualizer:
    """Filled circles at given image points, optionally per-point colors
    (reference vis/base.py PointsVisualizer)."""

    def __init__(self, color=(0, 255, 0), r=5):
        self.color = color
        self.r = r

    def visualize(self, image_bgr, pts_xy, colors_bgr=None):
        import cv2

        for j, (x, y) in enumerate(pts_xy):
            color = self.color if colors_bgr is None else tuple(colors_bgr[j])
            cv2.circle(image_bgr, (int(x), int(y)), self.r, color, -1)
        return image_bgr


class DensePoseDataCoarseSegmentationVisualizer:
    """GT coarse segmentation (14 body parts) overlay: the 256x256 segm
    raster of each ``DensePoseDataRelative`` is stretched over its gt box
    (reference densepose.py:498-524).  Data = (boxes_xywh, dp_datas)."""

    def __init__(self, inplace=True, alpha=0.7):
        from .structures import DensePoseDataRelative

        self.mask_visualizer = MatrixVisualizer(
            inplace=inplace,
            alpha=alpha,
            val_scale=255.0 / DensePoseDataRelative.N_BODY_PARTS,
        )

    def visualize(self, image_bgr, bbox_densepose_datas):
        import cv2

        if bbox_densepose_datas is None:
            return image_bgr
        for bbox_xywh, dp in zip(*bbox_densepose_datas):
            x, y, w, h = (max(int(round(float(t))), 1) for t in bbox_xywh)
            matrix = cv2.resize(dp.segm, (w, h), interpolation=cv2.INTER_NEAREST)
            image_bgr = self.mask_visualizer.visualize(
                image_bgr, matrix > 0, matrix, (x, y, w, h)
            )
        return image_bgr


class DensePoseDataPointsVisualizer:
    """GT annotated points: 256-normalized gt-box coordinates mapped into
    the image (x_img = x0 + x*w/256, reference densepose.py:526-555),
    optionally colormapped by a per-point value function."""

    def __init__(self, densepose_data_to_value_fn=None):
        self.points_visualizer = PointsVisualizer()
        self.densepose_data_to_value_fn = densepose_data_to_value_fn

    def visualize(self, image_bgr, bbox_densepose_datas):
        if bbox_densepose_datas is None:
            return image_bgr
        for bbox_xywh, dp in zip(*bbox_densepose_datas):
            x0, y0, w, h = (float(t) for t in np.asarray(bbox_xywh).ravel())
            xs = dp.x * w / 255.0 + x0
            ys = dp.y * h / 255.0 + y0
            if self.densepose_data_to_value_fn is None:
                colors = None
            else:
                vals = self.densepose_data_to_value_fn(dp)
                colors = [
                    [int(c) for c in row.ravel()]
                    for row in _colormap(vals[:, None])
                ]
            image_bgr = self.points_visualizer.visualize(
                image_bgr, zip(xs, ys), colors
            )
        return image_bgr


def _dp_u_for_cmap(dp):
    return (np.clip(dp.u, 0, 1) * 255.0).astype(np.uint8)


def _dp_v_for_cmap(dp):
    return (np.clip(dp.v, 0, 1) * 255.0).astype(np.uint8)


def _dp_i_for_cmap(dp):
    from .structures import DensePoseDataRelative

    n = DensePoseDataRelative.N_PART_LABELS
    return (np.clip(dp.i, 0.0, n) * 255.0 / n).astype(np.uint8)


class DensePoseDataPointsUVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        super().__init__(densepose_data_to_value_fn=_dp_u_for_cmap)


class DensePoseDataPointsVVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        super().__init__(densepose_data_to_value_fn=_dp_v_for_cmap)


class DensePoseDataPointsIVisualizer(DensePoseDataPointsVisualizer):
    def __init__(self):
        super().__init__(densepose_data_to_value_fn=_dp_i_for_cmap)


def create_extractor(visualizer):
    """Visualizer -> the Instances extractor feeding it (reference
    vis/extractor.py:32-48)."""
    from .structures import DensePoseResultExtractor

    if isinstance(visualizer, CompoundVisualizer):
        return CompoundExtractor(
            [create_extractor(v) for v in visualizer.visualizers]
        )
    if isinstance(visualizer, _DensePoseResultsVisualizer):
        return lambda inst, select=None: DensePoseResultExtractor()(inst, select)[0]
    if isinstance(visualizer, ScoredBoundingBoxVisualizer):
        return _scored_boxes_extractor
    if isinstance(visualizer, BoundingBoxVisualizer):
        return _boxes_extractor
    raise ValueError(f"no extractor registered for {type(visualizer).__name__}")


def _boxes_extractor(instances, select=None):
    if len(instances) == 0:
        return None
    boxes = np.asarray(instances.pred_boxes.tensor).copy()
    boxes[:, 2] -= boxes[:, 0]
    boxes[:, 3] -= boxes[:, 1]
    return boxes if select is None else boxes[np.asarray(select)]

def _scored_boxes_extractor(instances, select=None):
    boxes = _boxes_extractor(instances, select)
    if boxes is None:
        return None, None
    scores = np.asarray(instances.scores)
    if select is not None:
        scores = scores[np.asarray(select)]
    return boxes, scores


class CompoundExtractor:
    """One extractor per stacked visualizer (vis/extractor.py:94-108)."""

    def __init__(self, extractors):
        self.extractors = list(extractors)

    def __call__(self, instances, select=None):
        return [e(instances, select) for e in self.extractors]
