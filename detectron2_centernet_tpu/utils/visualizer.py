"""Visualization (reference ``detectron2/utils/visualizer.py``, 1171 LoC,
plus ``video_visualizer.py``).

cv2-based re-implementation of the capability surface used by the demo and
tools: ``draw_instance_predictions`` (boxes, labels, scores, masks,
keypoints), rotated-box drawing, ``draw_panoptic_seg``, ``draw_sem_seg``,
``draw_dataset_dict`` for GT browsing, the deterministic ``colormap``, and
``VideoVisualizer`` with cross-frame color consistency via box-IoU matching
(reference video_visualizer.py:180-247 matches by mask IoU; boxes are the
TPU-side fixed-shape analog).
"""

from typing import List, Optional

import numpy as np

__all__ = [
    "ColorMode",
    "VideoVisualizer",
    "Visualizer",
    "VisImage",
    "colormap",
    "random_color",
]

# COCO person keypoint skeleton (reference data/datasets/builtin_meta.py
# keypoint_connection_rules), by keypoint index pairs
_COCO_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def colormap(rgb: bool = True, maximum: int = 255) -> np.ndarray:
    """Deterministic 74-color palette (reference utils/colormap.py)."""
    rng = np.random.RandomState(42)
    colors = rng.rand(74, 3)
    colors = 0.3 + 0.7 * colors  # keep bright
    colors = (colors * maximum).astype(np.float32)
    if not rgb:
        colors = colors[:, ::-1]
    return colors


def random_color(rgb: bool = True, maximum: int = 255) -> np.ndarray:
    cmap = colormap(rgb, maximum)
    return cmap[np.random.randint(len(cmap))]


def _change_color_brightness(color, brightness_factor: float):
    """Lighter (>0) or darker (<0) variant of an RGB 0-255 color via HLS
    lightness scaling (reference visualizer.py:1108-1132)."""
    import colorsys

    r, g, b = (float(c) / 255.0 for c in color)
    h, l, s = colorsys.rgb_to_hls(r, g, b)
    l = min(max(l + brightness_factor * l, 0.0), 1.0)
    out = colorsys.hls_to_rgb(h, l, s)
    return tuple(int(round(c * 255.0)) for c in out)


def _jitter(color, rng=None):
    """Slightly perturb an RGB 0-255 color (reference visualizer.py:1072-1089:
    a random unit vector scaled to 0.5 in [0,1] color space)."""
    rng = rng or np.random
    vec = rng.rand(3)
    vec = vec / np.linalg.norm(vec) * 0.5
    res = np.clip(vec + np.asarray(color, np.float64) / 255.0, 0, 1)
    return tuple(int(round(c * 255.0)) for c in res)


class ColorMode:
    IMAGE = 0
    SEGMENTATION = 1
    IMAGE_BW = 2


class VisImage:
    def __init__(self, img: np.ndarray) -> None:
        self.img = np.ascontiguousarray(img.astype(np.uint8))

    def get_image(self) -> np.ndarray:
        return self.img

    def save(self, filepath: str) -> None:
        import cv2

        cv2.imwrite(filepath, self.img[:, :, ::-1])


class Visualizer:
    def __init__(self, img_rgb: np.ndarray, metadata=None, scale: float = 1.0,
                 instance_mode: int = ColorMode.IMAGE) -> None:
        self.img = np.asarray(img_rgb).clip(0, 255).astype(np.uint8)
        self.metadata = metadata
        self.output = VisImage(self.img.copy())
        self._cmap = colormap()
        self._instance_mode = instance_mode

    def _class_name(self, cls: int) -> str:
        names = self.metadata.get("thing_classes") if self.metadata is not None else None
        if names and 0 <= cls < len(names):
            return names[cls]
        return str(cls)

    def _create_grayscale_image(self, mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Grayscale copy of the base image; masked pixels keep their color
        (reference visualizer.py:1091-1100, ColorMode.IMAGE_BW)."""
        img_bw = self.img.astype(np.float32).mean(axis=2)
        img_bw = np.stack([img_bw] * 3, axis=2)
        if mask is not None:
            img_bw[mask] = self.img[mask]
        return img_bw.astype(np.uint8)

    def _instance_colors(self, classes, n: int):
        """Per-instance colors by mode (reference visualizer.py:378-392):
        SEGMENTATION uses jittered metadata thing_colors; otherwise the
        deterministic palette by class id."""
        thing_colors = (
            self.metadata.get("thing_colors") if self.metadata is not None else None
        )
        if (
            self._instance_mode == ColorMode.SEGMENTATION
            and thing_colors
            and classes is not None
        ):
            return [
                _jitter(thing_colors[int(c) % len(thing_colors)]) for c in classes
            ]
        if classes is not None:
            return [
                tuple(int(v) for v in self._cmap[int(c) % len(self._cmap)])
                for c in classes
            ]
        return [(0, 255, 0)] * n

    def _draw_mask_with_outline(self, img, mask, color, alpha: float) -> None:
        """Fill at ``alpha`` + polygon outline in a darker shade — the
        reference's draw_binary_mask draws mask_to_polygons contours with
        edge_color = brightness(color, -0.7) (visualizer.py:1040-1060)."""
        import cv2

        m = mask.astype(bool)
        img[m] = (1 - alpha) * img[m] + alpha * np.asarray(color)
        edge = _change_color_brightness(color, -0.7)
        contours, _ = cv2.findContours(
            mask.astype(np.uint8), cv2.RETR_CCOMP, cv2.CHAIN_APPROX_NONE
        )
        cv2.polylines(img, contours, True, edge, 1, cv2.LINE_AA)

    def _draw_label(self, img, label: str, pos, color) -> None:
        """Auto-contrast label: the reference brightens the instance color
        (brightness_factor=0.7) and draws on a dark backdrop
        (visualizer.py:669-672 + draw_text's black-ish halo)."""
        import cv2

        light = _change_color_brightness(color, 0.7)
        cv2.putText(img, label, pos, cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    (0, 0, 0), 3, cv2.LINE_AA)
        cv2.putText(img, label, pos, cv2.FONT_HERSHEY_SIMPLEX, 0.4,
                    light, 1, cv2.LINE_AA)

    def draw_instance_predictions(self, predictions, **kwargs) -> VisImage:
        """predictions: Instances with pred_boxes/scores/pred_classes
        (+ optional pred_masks)."""
        import cv2

        boxes = np.asarray(predictions.pred_boxes.tensor) if predictions.has("pred_boxes") else None
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = np.asarray(predictions.pred_classes) if predictions.has("pred_classes") else None
        masks = (
            np.asarray(predictions.pred_masks) if predictions.has("pred_masks") else None
        )

        keypoints = (
            np.asarray(predictions.pred_keypoints)
            if predictions.has("pred_keypoints")
            else None
        )

        alpha = 0.5
        if self._instance_mode == ColorMode.SEGMENTATION and (
            self.metadata is not None and self.metadata.get("thing_colors")
        ):
            alpha = 0.8
        if self._instance_mode == ColorMode.IMAGE_BW:
            # grayscale everywhere except the union of predicted masks
            union = (
                masks.astype(bool).any(axis=0) if masks is not None else None
            )
            self.output = VisImage(self._create_grayscale_image(union))
            alpha = 0.3

        img = self.output.img.astype(np.float32)
        n = len(predictions)
        colors = kwargs.get("assigned_colors")
        if colors is None:
            colors = self._instance_colors(classes, n)
        for i in range(n):
            color = tuple(int(c) for c in colors[i])
            if masks is not None:
                self._draw_mask_with_outline(img, masks[i], color, alpha)
        img = img.astype(np.uint8)
        for i in range(n):
            color = tuple(int(c) for c in colors[i])
            if boxes is not None:
                x0, y0, x1, y1 = (int(v) for v in boxes[i])
                cv2.rectangle(img, (x0, y0), (x1, y1), color, 1)
                label = self._class_name(int(classes[i])) if classes is not None else ""
                if scores is not None:
                    label = f"{label} {scores[i]:.0%}"
                if label:
                    self._draw_label(img, label, (x0, max(y0 - 3, 10)), color)
            if keypoints is not None:
                self._draw_keypoints(img, keypoints[i])
        self.output = VisImage(img)
        return self.output

    def _draw_keypoints(self, img: np.ndarray, kpts: np.ndarray,
                        threshold: float = 0.05) -> None:
        """Draw one instance's (K, 3) keypoints + skeleton (reference
        draw_and_connect_keypoints, visualizer.py:730-790)."""
        import cv2

        rules = None
        if self.metadata is not None:
            rules = self.metadata.get("keypoint_connection_rules")
        vis = kpts[:, 2] > threshold
        for k, (x, y, v) in enumerate(kpts):
            if vis[k]:
                cv2.circle(img, (int(x), int(y)), 2, (0, 0, 255), -1)
        if rules:
            names = list(self.metadata.get("keypoint_names") or [])
            for a, b, color in rules:
                ia, ib = names.index(a), names.index(b)
                if vis[ia] and vis[ib]:
                    cv2.line(img, (int(kpts[ia, 0]), int(kpts[ia, 1])),
                             (int(kpts[ib, 0]), int(kpts[ib, 1])),
                             tuple(int(c) for c in color), 1, cv2.LINE_AA)
        elif kpts.shape[0] == 17:  # COCO person fallback
            for ia, ib in _COCO_SKELETON:
                if vis[ia] and vis[ib]:
                    cv2.line(img, (int(kpts[ia, 0]), int(kpts[ia, 1])),
                             (int(kpts[ib, 0]), int(kpts[ib, 1])),
                             (255, 128, 0), 1, cv2.LINE_AA)

    def draw_rotated_instance_predictions(self, predictions) -> VisImage:
        """Instances with pred_boxes as (cx, cy, w, h, angle_deg) rotated
        boxes (reference draw_rotated_box_with_label, visualizer.py:936-978)."""
        import cv2

        img = self.output.img
        boxes = np.asarray(predictions.pred_boxes.tensor)
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = (
            np.asarray(predictions.pred_classes)
            if predictions.has("pred_classes")
            else None
        )
        for i in range(len(predictions)):
            cx, cy, bw, bh, ang = (float(v) for v in boxes[i])
            color = (
                tuple(int(c) for c in self._cmap[int(classes[i]) % len(self._cmap)])
                if classes is not None
                else (0, 255, 0)
            )
            pts = cv2.boxPoints(((cx, cy), (bw, bh), -ang)).astype(np.int32)
            cv2.polylines(img, [pts], True, color, 1, cv2.LINE_AA)
            label = self._class_name(int(classes[i])) if classes is not None else ""
            if scores is not None:
                label = f"{label} {scores[i]:.0%}"
            if label:
                # label at the topmost corner in a lighter auto-contrast
                # shade (reference draw_rotated_box_with_label,
                # visualizer.py:936-978)
                top = pts[np.argmin(pts[:, 1])]
                self._draw_label(
                    img, label, (int(top[0]), max(int(top[1]) - 3, 10)), color
                )
        self.output = VisImage(img)
        return self.output

    def draw_panoptic_seg(self, panoptic_seg: np.ndarray, segments_info,
                          alpha: float = 0.5) -> VisImage:
        """panoptic_seg (H, W) segment ids + segments_info dicts with
        id/category_id/isthing (reference draw_panoptic_seg_predictions,
        visualizer.py:439-500): stuff first, then instances with labels."""
        import cv2

        img = self.output.img.astype(np.float32)
        panoptic_seg = np.asarray(panoptic_seg)
        stuff = [s for s in segments_info if not s.get("isthing", False)]
        things = [s for s in segments_info if s.get("isthing", False)]
        names_st = (
            self.metadata.get("stuff_classes") if self.metadata is not None else None
        )
        for s in stuff + things:
            m = panoptic_seg == s["id"]
            if not m.any():
                continue
            cat = int(s.get("category_id", 0))
            color = self._cmap[(cat + (37 if s.get("isthing") else 0)) % len(self._cmap)]
            img[m] = (1 - alpha) * img[m] + alpha * color
        out = img.astype(np.uint8)
        for s in things:
            m = panoptic_seg == s["id"]
            if not m.any():
                continue
            ys, xs = np.nonzero(m)
            label = self._class_name(int(s.get("category_id", 0)))
            cv2.putText(out, label, (int(xs.mean()), int(ys.mean())),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, (255, 255, 255), 1,
                        cv2.LINE_AA)
        for s in stuff:
            m = panoptic_seg == s["id"]
            if not m.any() or names_st is None:
                continue
            cat = int(s.get("category_id", 0))
            if 0 <= cat < len(names_st):
                ys, xs = np.nonzero(m)
                cv2.putText(out, names_st[cat], (int(xs.mean()), int(ys.mean())),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4, (200, 200, 200), 1,
                            cv2.LINE_AA)
        self.output = VisImage(out)
        return self.output

    def draw_dataset_dict(self, dic: dict) -> VisImage:
        """Draw ground-truth annotations of one dataset dict."""
        import cv2

        from ..structures import BoxMode

        img = self.output.img
        for a in dic.get("annotations", []):
            box = BoxMode.convert(a["bbox"], a["bbox_mode"], BoxMode.XYXY_ABS)
            color = self._cmap[int(a.get("category_id", 0)) % len(self._cmap)]
            color = tuple(int(c) for c in color)
            x0, y0, x1, y1 = (int(v) for v in box)
            cv2.rectangle(img, (x0, y0), (x1, y1), color, 1)
            cv2.putText(img, self._class_name(int(a.get("category_id", 0))),
                        (x0, max(y0 - 3, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
        self.output = VisImage(img)
        return self.output

    def draw_sem_seg(self, sem_seg: np.ndarray, alpha: float = 0.5) -> VisImage:
        """Metadata ``stuff_colors`` take precedence over the palette
        (reference draw_sem_seg, visualizer.py:404-437)."""
        img = self.output.img.astype(np.float32)
        sem_seg = np.asarray(sem_seg)
        stuff_colors = (
            self.metadata.get("stuff_colors") if self.metadata is not None else None
        )
        for cls in np.unique(sem_seg):
            m = sem_seg == cls
            if stuff_colors and 0 <= int(cls) < len(stuff_colors):
                color = np.asarray(stuff_colors[int(cls)], np.float32)
            else:
                color = self._cmap[int(cls) % len(self._cmap)]
            img[m] = (1 - alpha) * img[m] + alpha * color
        self.output = VisImage(img)
        return self.output


class VideoVisualizer:
    """Frame-by-frame drawing with cross-frame color consistency
    (reference ``utils/video_visualizer.py:39-247``).

    The reference matches instances across frames by mask IoU to keep
    per-instance colors stable; this implementation matches by box IoU +
    same class, which is cheap and works for every model family (not just
    mask-on ones).
    """

    def __init__(self, metadata=None, instance_mode: int = ColorMode.IMAGE):
        self.metadata = metadata
        self._prev_boxes: Optional[np.ndarray] = None
        self._prev_classes: Optional[np.ndarray] = None
        self._prev_colors: Optional[np.ndarray] = None
        self._cmap = colormap()
        self._next_color = 0

    def _fresh_color(self) -> np.ndarray:
        c = self._cmap[self._next_color % len(self._cmap)]
        self._next_color += 1
        return c

    def _assign_colors(self, boxes, classes) -> np.ndarray:
        n = len(boxes)
        colors = np.zeros((n, 3), np.float32)
        if self._prev_boxes is None or len(self._prev_boxes) == 0 or n == 0:
            for i in range(n):
                colors[i] = self._fresh_color()
        else:
            a = boxes[:, None]  # (n, 1, 4)
            b = self._prev_boxes[None]  # (1, m, 4)
            lt = np.maximum(a[..., :2], b[..., :2])
            rb = np.minimum(a[..., 2:], b[..., 2:])
            inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
            area_a = np.prod(np.clip(a[..., 2:] - a[..., :2], 0, None), -1)
            area_b = np.prod(np.clip(b[..., 2:] - b[..., :2], 0, None), -1)
            iou = inter / np.maximum(area_a + area_b - inter, 1e-6)
            if classes is not None and self._prev_classes is not None:
                iou = np.where(
                    classes[:, None] == self._prev_classes[None], iou, 0.0
                )
            taken = np.zeros(iou.shape[1], bool)
            for i in np.argsort(-iou.max(axis=1)):
                j = int(np.argmax(np.where(taken, -1.0, iou[i])))
                if iou[i, j] > 0.3 and not taken[j]:
                    colors[i] = self._prev_colors[j]
                    taken[j] = True
                else:
                    colors[i] = self._fresh_color()
        self._prev_boxes = boxes.copy()
        self._prev_classes = None if classes is None else classes.copy()
        self._prev_colors = colors
        return colors

    def draw_instance_predictions(self, frame: np.ndarray, predictions) -> VisImage:
        vis = Visualizer(frame, self.metadata)
        boxes = (
            np.asarray(predictions.pred_boxes.tensor)
            if predictions.has("pred_boxes")
            else np.zeros((len(predictions), 4), np.float32)
        )
        classes = (
            np.asarray(predictions.pred_classes)
            if predictions.has("pred_classes")
            else None
        )
        colors = self._assign_colors(boxes, classes)
        return vis.draw_instance_predictions(predictions, assigned_colors=colors)

    def draw_sem_seg(self, frame: np.ndarray, sem_seg) -> VisImage:
        return Visualizer(frame, self.metadata).draw_sem_seg(sem_seg)

    def draw_panoptic_seg_predictions(
        self, frame: np.ndarray, panoptic_seg, segments_info
    ) -> VisImage:
        return Visualizer(frame, self.metadata).draw_panoptic_seg(
            panoptic_seg, segments_info
        )
