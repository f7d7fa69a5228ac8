"""Boxes and box-mode conversions.

Host-side analog of the reference's ``detectron2/structures/boxes.py``
(Boxes at :133, BoxMode at :13, pairwise ops at :314-383), backed by numpy
instead of torch tensors.  On-device code never uses these wrappers — jitted
kernels operate on raw ``(N, 4)`` arrays in XYXY_ABS layout; ``Boxes`` is the
host boundary representation handed to evaluators and visualizers.
"""

import math
from enum import IntEnum, unique
from typing import Any, List, Tuple, Union

import numpy as np

_RawBoxType = Union[List[float], Tuple[float, ...], np.ndarray]


@unique
class BoxMode(IntEnum):
    """Coordinate conventions for a box, matching the reference enum values."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box: _RawBoxType, from_mode: "BoxMode", to_mode: "BoxMode") -> Any:
        """Convert box(es) between modes; accepts (4,)/(5,) or (N, 4)/(N, 5)."""
        if from_mode == to_mode:
            return box

        original_type = type(box)
        is_numpy = isinstance(box, np.ndarray)
        single_box = isinstance(box, (list, tuple))
        if single_box:
            assert len(box) == 4 or len(box) == 5, (
                "BoxMode.convert takes either a k-tuple/list or an Nxk array/tensor "
                "where k == 4 or 5"
            )
            arr = np.array(box, dtype=np.float64)[None, :]
        else:
            arr = np.asarray(box, dtype=np.float64).copy()

        if to_mode in (BoxMode.XYXY_REL, BoxMode.XYWH_REL) or from_mode in (
            BoxMode.XYXY_REL,
            BoxMode.XYWH_REL,
        ):
            raise NotImplementedError("Relative box modes are not supported")

        if from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            assert arr.shape[-1] == 5, "XYWHA boxes have 5 values"
            original_dtype = arr.dtype
            w = arr[:, 2]
            h = arr[:, 3]
            a = arr[:, 4]
            c = np.abs(np.cos(a * math.pi / 180.0))
            s = np.abs(np.sin(a * math.pi / 180.0))
            # Axis-aligned hull of the rotated box.
            new_w = c * w + s * h
            new_h = c * h + s * w
            out = np.zeros((arr.shape[0], 4), dtype=original_dtype)
            out[:, 0] = arr[:, 0] - new_w / 2.0
            out[:, 1] = arr[:, 1] - new_h / 2.0
            out[:, 2] = arr[:, 0] + new_w / 2.0
            out[:, 3] = arr[:, 1] + new_h / 2.0
            arr = out
        elif from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYWHA_ABS:
            original_dtype = arr.dtype
            out = np.zeros((arr.shape[0], 5), dtype=original_dtype)
            out[:, 0] = arr[:, 0] + arr[:, 2] / 2.0
            out[:, 1] = arr[:, 1] + arr[:, 3] / 2.0
            out[:, 2] = arr[:, 2]
            out[:, 3] = arr[:, 3]
            arr = out
        elif to_mode == BoxMode.XYXY_ABS and from_mode == BoxMode.XYWH_ABS:
            arr[:, 2] += arr[:, 0]
            arr[:, 3] += arr[:, 1]
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            arr[:, 2] -= arr[:, 0]
            arr[:, 3] -= arr[:, 1]
        else:
            raise NotImplementedError(
                f"Conversion from BoxMode {from_mode} to {to_mode} is not supported"
            )

        if single_box:
            return original_type(arr.flatten().tolist())
        if is_numpy:
            return arr
        return arr


class Boxes:
    """A list of boxes stored as an ``(N, 4)`` float array in XYXY_ABS order."""

    def __init__(self, tensor: np.ndarray) -> None:
        tensor = np.asarray(tensor, dtype=np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape((0, 4))
        assert tensor.ndim == 2 and tensor.shape[-1] == 4, tensor.shape
        self.tensor = tensor

    def clone(self) -> "Boxes":
        return Boxes(self.tensor.copy())

    def area(self) -> np.ndarray:
        box = self.tensor
        return (box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1])

    def clip(self, box_size: Tuple[int, int]) -> None:
        """Clip coordinates in-place to ``[0, w] x [0, h]``; size is (h, w)."""
        assert np.isfinite(self.tensor).all(), "Box tensor contains infinite or NaN!"
        h, w = box_size
        self.tensor[:, 0] = self.tensor[:, 0].clip(0, w)
        self.tensor[:, 1] = self.tensor[:, 1].clip(0, h)
        self.tensor[:, 2] = self.tensor[:, 2].clip(0, w)
        self.tensor[:, 3] = self.tensor[:, 3].clip(0, h)

    def nonempty(self, threshold: float = 0.0) -> np.ndarray:
        box = self.tensor
        widths = box[:, 2] - box[:, 0]
        heights = box[:, 3] - box[:, 1]
        return (widths > threshold) & (heights > threshold)

    def scale(self, scale_x: float, scale_y: float) -> None:
        self.tensor[:, 0::2] *= scale_x
        self.tensor[:, 1::2] *= scale_y

    def get_centers(self) -> np.ndarray:
        return (self.tensor[:, :2] + self.tensor[:, 2:]) / 2

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> np.ndarray:
        h, w = box_size
        return (
            (self.tensor[:, 0] >= -boundary_threshold)
            & (self.tensor[:, 1] >= -boundary_threshold)
            & (self.tensor[:, 2] < w + boundary_threshold)
            & (self.tensor[:, 3] < h + boundary_threshold)
        )

    def __getitem__(self, item) -> "Boxes":
        if isinstance(item, int):
            return Boxes(self.tensor[item : item + 1])
        b = self.tensor[item]
        assert b.ndim == 2, f"Indexing on Boxes with {item} failed!"
        return Boxes(b)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __iter__(self):
        yield from self.tensor

    def __repr__(self) -> str:
        return "Boxes(" + str(self.tensor) + ")"

    @classmethod
    def cat(cls, boxes_list: List["Boxes"]) -> "Boxes":
        if len(boxes_list) == 0:
            return cls(np.zeros((0, 4), dtype=np.float32))
        return cls(np.concatenate([b.tensor for b in boxes_list], axis=0))


def pairwise_intersection(boxes1: Boxes, boxes2: Boxes) -> np.ndarray:
    """Intersection areas for all N x M box pairs."""
    b1, b2 = boxes1.tensor, boxes2.tensor
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])  # (N, M, 2)
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])  # (N, M, 2)
    wh = np.clip(rb - lt, 0, None)
    return wh[:, :, 0] * wh[:, :, 1]


def pairwise_iou(boxes1: Boxes, boxes2: Boxes) -> np.ndarray:
    """IoU for all N x M pairs (reference boxes.py:314-355 semantics)."""
    area1 = boxes1.area()
    area2 = boxes2.area()
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return np.where(inter > 0, inter / np.maximum(union, 1e-12), 0.0)


def pairwise_ioa(boxes1: Boxes, boxes2: Boxes) -> np.ndarray:
    """Intersection over the area of boxes2, for all pairs."""
    area2 = boxes2.area()
    inter = pairwise_intersection(boxes1, boxes2)
    return np.where(inter > 0, inter / np.maximum(area2[None, :], 1e-12), 0.0)


def matched_boxlist_iou(boxes1: Boxes, boxes2: Boxes) -> np.ndarray:
    """IoU between corresponding pairs of two equal-length box lists."""
    assert len(boxes1) == len(boxes2)
    area1 = boxes1.area()
    area2 = boxes2.area()
    b1, b2 = boxes1.tensor, boxes2.tensor
    lt = np.maximum(b1[:, :2], b2[:, :2])
    rb = np.minimum(b1[:, 2:], b2[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    return inter / np.maximum(area1 + area2 - inter, 1e-12)
