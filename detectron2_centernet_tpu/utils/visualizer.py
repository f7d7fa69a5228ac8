"""Visualization (reference ``detectron2/utils/visualizer.py``, 1171 LoC).

cv2-based re-implementation of the capability surface actually used by the
demo/tools: ``Visualizer.draw_instance_predictions`` (boxes, labels, scores,
masks), ``draw_dataset_dict`` for GT browsing, and the deterministic
``colormap``.  Returns a ``VisImage``-like object with ``get_image()``.
"""

from typing import List, Optional

import numpy as np

__all__ = ["ColorMode", "Visualizer", "VisImage", "colormap", "random_color"]


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

    def _class_name(self, cls: int) -> str:
        names = self.metadata.get("thing_classes") if self.metadata is not None else None
        if names and 0 <= cls < len(names):
            return names[cls]
        return str(cls)

    def draw_instance_predictions(self, predictions) -> VisImage:
        """predictions: Instances with pred_boxes/scores/pred_classes
        (+ optional pred_masks)."""
        import cv2

        img = self.output.img
        boxes = np.asarray(predictions.pred_boxes.tensor) if predictions.has("pred_boxes") else None
        scores = np.asarray(predictions.scores) if predictions.has("scores") else None
        classes = np.asarray(predictions.pred_classes) if predictions.has("pred_classes") else None
        masks = (
            np.asarray(predictions.pred_masks) if predictions.has("pred_masks") else None
        )

        n = len(predictions)
        for i in range(n):
            color = self._cmap[int(classes[i]) % len(self._cmap)] if classes is not None else (0, 255, 0)
            color = tuple(int(c) for c in color)
            if masks is not None:
                m = masks[i].astype(bool)
                img[m] = 0.5 * img[m] + 0.5 * np.asarray(color)
            if boxes is not None:
                x0, y0, x1, y1 = (int(v) for v in boxes[i])
                cv2.rectangle(img, (x0, y0), (x1, y1), color, 1)
                label = self._class_name(int(classes[i])) if classes is not None else ""
                if scores is not None:
                    label = f"{label} {scores[i]:.0%}"
                if label:
                    cv2.putText(img, label, (x0, max(y0 - 3, 10)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA)
        self.output = VisImage(img)
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
        img = self.output.img.astype(np.float32)
        sem_seg = np.asarray(sem_seg)
        for cls in np.unique(sem_seg):
            m = sem_seg == cls
            color = self._cmap[int(cls) % len(self._cmap)]
            img[m] = (1 - alpha) * img[m] + alpha * color
        self.output = VisImage(img)
        return self.output
