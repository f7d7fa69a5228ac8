"""Mask structures (reference ``detectron2/structures/masks.py``).

``BitMasks`` (:84) and ``PolygonMasks`` (:239) host-side containers, polygon
rasterization (``polygons_to_bitmask`` :35 — cv2.fillPoly here instead of
pycocotools, which this environment lacks), and
``rasterize_polygons_within_box`` (:20) used to build mask-head training
targets.

TPU redesign of the training path: the mapper rasterizes each gt mask ONCE
into a fixed ``(R, R)`` raster in gt-box-relative coordinates
(``rasterize_in_box``); the device then bilinear-crops proposal-box windows
out of these rasters inside the jitted step (models/roi_heads/mask_head.py)
instead of re-rasterizing polygons per sampled proposal every iteration.
"""

import copy
from typing import Any, Iterator, List, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "BitMasks",
    "PolygonMasks",
    "polygons_to_bitmask",
    "rasterize_in_box",
    "paste_masks_in_image",
]


def polygons_to_bitmask(polygons: List[np.ndarray], height: int, width: int) -> np.ndarray:
    """List of XY-interleaved polygons -> (H, W) bool mask."""
    import cv2

    mask = np.zeros((height, width), np.uint8)
    pts = [np.round(np.asarray(p, np.float64).reshape(-1, 2)).astype(np.int32) for p in polygons]
    pts = [p for p in pts if len(p) >= 3]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


def rasterize_in_box(
    polygons: List[np.ndarray], box: np.ndarray, mask_size: int
) -> np.ndarray:
    """Rasterize polygons within ``box`` (XYXY) onto a (mask_size, mask_size)
    float grid (reference rasterize_polygons_within_box, masks.py:20-80:
    translate to box origin, scale to the grid, fill)."""
    w = max(box[2] - box[0], 1e-2)
    h = max(box[3] - box[1], 1e-2)
    scaled = []
    for p in polygons:
        p = np.asarray(p, np.float64).reshape(-1, 2).copy()
        p[:, 0] = (p[:, 0] - box[0]) * (mask_size / w)
        p[:, 1] = (p[:, 1] - box[1]) * (mask_size / h)
        scaled.append(p.reshape(-1))
    return polygons_to_bitmask(scaled, mask_size, mask_size).astype(np.float32)


class BitMasks:
    """(N, H, W) bool masks (reference masks.py:84)."""

    def __init__(self, tensor: np.ndarray) -> None:
        tensor = np.asarray(tensor, bool)
        assert tensor.ndim == 3, tensor.shape
        self.tensor = tensor
        self.image_size: Tuple[int, int] = tensor.shape[1:]

    def __getitem__(self, item) -> "BitMasks":
        if isinstance(item, int):
            return BitMasks(self.tensor[item : item + 1])
        return BitMasks(self.tensor[item])

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __iter__(self):
        return iter(self.tensor)

    def nonempty(self) -> np.ndarray:
        return self.tensor.reshape(len(self), -1).any(axis=1)

    def get_bounding_boxes(self):
        from .boxes import Boxes

        boxes = np.zeros((len(self), 4), np.float32)
        for i, m in enumerate(self.tensor):
            ys, xs = np.nonzero(m)
            if len(ys):
                boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return Boxes(boxes)

    @staticmethod
    def from_polygon_masks(polygon_masks: "PolygonMasks", height: int, width: int) -> "BitMasks":
        return BitMasks(
            np.stack(
                [polygons_to_bitmask(p, height, width) for p in polygon_masks.polygons]
            )
            if len(polygon_masks)
            else np.zeros((0, height, width), bool)
        )

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """(N, mask_size, mask_size) bool crops (reference masks.py:170-204)."""
        import cv2

        out = np.zeros((len(self), mask_size, mask_size), np.float32)
        for i, (m, b) in enumerate(zip(self.tensor, boxes)):
            x0, y0, x1, y1 = [int(round(v)) for v in b]
            x0, y0 = max(x0, 0), max(y0, 0)
            x1 = min(max(x1, x0 + 1), m.shape[1])
            y1 = min(max(y1, y0 + 1), m.shape[0])
            crop = m[y0:y1, x0:x1].astype(np.float32)
            out[i] = cv2.resize(crop, (mask_size, mask_size), interpolation=cv2.INTER_LINEAR)
        return out >= 0.5

    def __repr__(self) -> str:
        return f"BitMasks(num_instances={len(self)})"


class PolygonMasks:
    """Per-instance polygon lists (reference masks.py:239)."""

    def __init__(self, polygons: List[List[Union[np.ndarray, List[float]]]]) -> None:
        self.polygons: List[List[np.ndarray]] = [
            [np.asarray(p, np.float64) for p in inst] for inst in polygons
        ]

    def __len__(self) -> int:
        return len(self.polygons)

    def __getitem__(self, item) -> "PolygonMasks":
        if isinstance(item, int):
            return PolygonMasks([self.polygons[item]])
        if isinstance(item, slice):
            return PolygonMasks(self.polygons[item])
        if isinstance(item, (list, tuple)):
            return PolygonMasks([self.polygons[i] for i in item])
        item = np.asarray(item)
        if item.dtype == bool:
            item = np.nonzero(item)[0]
        return PolygonMasks([self.polygons[int(i)] for i in item])

    def __iter__(self) -> Iterator[List[np.ndarray]]:
        return iter(self.polygons)

    def nonempty(self) -> np.ndarray:
        return np.asarray([len(p) > 0 for p in self.polygons], bool)

    def get_bounding_boxes(self):
        from .boxes import Boxes

        boxes = np.zeros((len(self), 4), np.float32)
        for i, inst in enumerate(self.polygons):
            if not inst:
                continue
            pts = np.concatenate([p.reshape(-1, 2) for p in inst], axis=0)
            boxes[i] = [pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()]
        return Boxes(boxes)

    def area(self) -> np.ndarray:
        out = []
        for inst in self.polygons:
            a = 0.0
            for p in inst:
                pts = p.reshape(-1, 2)
                x, y = pts[:, 0], pts[:, 1]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out)

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        return np.stack(
            [rasterize_in_box(p, b, mask_size) >= 0.5 for p, b in zip(self.polygons, boxes)]
        ) if len(self) else np.zeros((0, mask_size, mask_size), bool)

    def __repr__(self) -> str:
        return f"PolygonMasks(num_instances={len(self)})"


def paste_masks_in_image(
    masks: np.ndarray,  # (N, M, M) float probabilities
    boxes: np.ndarray,  # (N, 4) XYXY in image coords
    image_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """Paste fixed-size mask crops into image-size bool masks — the exact
    semantics of the reference's ``_do_paste_mask`` (layers/mask_ops.py:
    16-66): each output pixel center (x+0.5, y+0.5) samples the mask with
    ``grid_sample(align_corners=False)`` over the SUB-PIXEL box (no
    floor/ceil snapping), zero padding outside. Golden-tested against the
    reference function."""
    h, w = image_shape
    n = len(masks)
    out = np.zeros((n, h, w), bool)
    for i in range(n):
        x0, y0, x1, y1 = [float(v) for v in boxes[i]]
        m = masks[i].astype(np.float32)
        mh, mw = m.shape
        x0i = max(int(np.floor(x0)) - 1, 0)
        y0i = max(int(np.floor(y0)) - 1, 0)
        x1i = min(int(np.ceil(x1)) + 1, w)
        y1i = min(int(np.ceil(y1)) + 1, h)
        if x1i <= x0i or y1i <= y0i:
            continue
        # normalized grid coords -> mask pixel coords, align_corners=False:
        # p = ((g + 1) * M - 1) / 2
        gy = (np.arange(y0i, y1i, dtype=np.float64) + 0.5 - y0) / max(y1 - y0, 1e-6) * 2 - 1
        gx = (np.arange(x0i, x1i, dtype=np.float64) + 0.5 - x0) / max(x1 - x0, 1e-6) * 2 - 1
        py = ((gy + 1) * mh - 1) / 2
        px = ((gx + 1) * mw - 1) / 2
        y0f = np.floor(py)
        x0f = np.floor(px)
        wy1 = py - y0f
        wx1 = px - x0f
        acc = np.zeros((len(py), len(px)), np.float64)
        for dy in (0, 1):
            yi = y0f + dy
            vy = (yi >= 0) & (yi < mh)
            yc = np.clip(yi, 0, mh - 1).astype(np.int64)
            wy = (wy1 if dy else 1.0 - wy1) * vy
            for dx in (0, 1):
                xi = x0f + dx
                vx = (xi >= 0) & (xi < mw)
                xc = np.clip(xi, 0, mw - 1).astype(np.int64)
                wx = (wx1 if dx else 1.0 - wx1) * vx
                acc += m[yc][:, xc] * wy[:, None] * wx[None, :]
        out[i, y0i:y1i, x0i:x1i] = acc >= threshold
    return out
