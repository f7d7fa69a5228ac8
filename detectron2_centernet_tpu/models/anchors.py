"""Anchor generation (reference ``detectron2/modeling/anchor_generator.py``).

``DefaultAnchorGenerator`` (:80): per-level cell anchors from sizes x
aspect_ratios centered at (offset + i) * stride, broadcast over the feature
grid.  Shapes are static (they depend only on the compiled input size), so
anchors are computed once at trace time as constants folded into the program.
"""

import math
from typing import List, Sequence, Tuple

import numpy as np

from ..config import CfgNode

__all__ = ["DefaultAnchorGenerator", "RotatedAnchorGenerator", "build_anchor_generator"]


def _cell_anchors(sizes: Sequence[float], aspect_ratios: Sequence[float]) -> np.ndarray:
    """(A, 4) XYXY anchors centered at origin (reference :156-180)."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, np.float32)


class DefaultAnchorGenerator:
    def __init__(
        self,
        sizes: Sequence[Sequence[float]],
        aspect_ratios: Sequence[Sequence[float]],
        strides: Sequence[int],
        offset: float = 0.0,
    ) -> None:
        num_levels = len(strides)
        # broadcast singleton size/ratio lists over all levels (reference :108-120)
        if len(sizes) == 1:
            sizes = list(sizes) * num_levels
        if len(aspect_ratios) == 1:
            aspect_ratios = list(aspect_ratios) * num_levels
        assert len(sizes) == num_levels and len(aspect_ratios) == num_levels
        self.strides = list(strides)
        self.cell_anchors = [
            _cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]
        self.offset = offset

    @property
    def num_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Per level: (H*W*A, 4) XYXY anchors for the given feature grids."""
        out = []
        for (h, w), stride, cells in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(w, dtype=np.float32) + self.offset) * stride
            shift_y = (np.arange(h, dtype=np.float32) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (HW,1,4)
            anchors = (shifts + cells[None]).reshape(-1, 4)  # (HW*A, 4)
            out.append(anchors)
        return out

    def __call__(self, grid_sizes: Sequence[Tuple[int, int]]) -> np.ndarray:
        """All levels concatenated: (sum HWA, 4)."""
        return np.concatenate(self.grid_anchors(grid_sizes), axis=0)


def build_anchor_generator(cfg: CfgNode, strides: Sequence[int]) -> DefaultAnchorGenerator:
    a = cfg.MODEL.ANCHOR_GENERATOR
    return DefaultAnchorGenerator(
        sizes=a.SIZES, aspect_ratios=a.ASPECT_RATIOS, strides=strides, offset=a.OFFSET
    )


class RotatedAnchorGenerator:
    """Rotated cell anchors: sizes x aspect_ratios x angles -> (A, 5)
    (cx, cy, w, h, angle) anchors per cell (reference anchor_generator.py:232)."""

    def __init__(self, sizes, aspect_ratios, angles, strides, offset: float = 0.5):
        num_levels = len(strides)
        if len(sizes) == 1:
            sizes = list(sizes) * num_levels
        if len(aspect_ratios) == 1:
            aspect_ratios = list(aspect_ratios) * num_levels
        if len(angles) == 1:
            angles = list(angles) * num_levels
        self.strides = list(strides)
        self.offset = offset
        self.cell_anchors = []
        for s_l, a_l, an_l in zip(sizes, aspect_ratios, angles):
            cells = []
            for size in s_l:
                area = size ** 2.0
                for ar in a_l:
                    w = math.sqrt(area / ar)
                    h = ar * w
                    for ang in an_l:
                        cells.append([0.0, 0.0, w, h, float(ang)])
            self.cell_anchors.append(np.asarray(cells, np.float32))

    @property
    def num_anchors(self):
        return [len(c) for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes):
        out = []
        for (h, w), stride, cells in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(w, dtype=np.float32) + self.offset) * stride
            shift_y = (np.arange(h, dtype=np.float32) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack(
                [sx, sy, np.zeros_like(sx), np.zeros_like(sx), np.zeros_like(sx)], -1
            ).reshape(-1, 1, 5)
            out.append((shifts + cells[None]).reshape(-1, 5))
        return out

    def __call__(self, grid_sizes):
        return np.concatenate(self.grid_anchors(grid_sizes), axis=0)
