"""Keypoint structures (reference ``detectron2/structures/keypoints.py``).

``Keypoints`` container plus the heatmap codec:
``keypoints_to_heatmap_targets`` (reference ``_keypoints_to_heatmap`` :85) and
``heatmaps_to_keypoints`` (:145) as numpy/jnp-friendly functions over fixed
shapes.
"""

from typing import Any, List, Tuple, Union

import numpy as np

__all__ = ["Keypoints", "keypoints_to_heatmap_targets", "heatmaps_to_keypoints"]


class Keypoints:
    """(N, K, 3) keypoints: (x, y, visibility)."""

    def __init__(self, keypoints: Union[np.ndarray, List]) -> None:
        keypoints = np.asarray(keypoints, np.float32)
        assert keypoints.ndim == 3 and keypoints.shape[2] == 3, keypoints.shape
        self.tensor = keypoints

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Keypoints":
        if isinstance(item, int):
            return Keypoints(self.tensor[item : item + 1])
        return Keypoints(self.tensor[item])

    def to_heatmap(self, boxes: np.ndarray, heatmap_size: int) -> Tuple[np.ndarray, np.ndarray]:
        return keypoints_to_heatmap_targets(self.tensor, boxes, heatmap_size)

    def __repr__(self) -> str:
        return f"Keypoints(num_instances={len(self)})"


def keypoints_to_heatmap_targets(
    keypoints: np.ndarray,  # (N, K, 3)
    rois: np.ndarray,  # (N, 4) XYXY
    heatmap_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-roi integer heatmap indices + validity (reference :85-142)."""
    kp = np.asarray(keypoints, np.float64)
    rois = np.asarray(rois, np.float64)
    offset_x = rois[:, 0][:, None]
    offset_y = rois[:, 1][:, None]
    scale_x = heatmap_size / np.maximum(rois[:, 2] - rois[:, 0], 1e-6)[:, None]
    scale_y = heatmap_size / np.maximum(rois[:, 3] - rois[:, 1], 1e-6)[:, None]

    x = (kp[..., 0] - offset_x) * scale_x
    y = (kp[..., 1] - offset_y) * scale_y
    x_boundary = x == heatmap_size
    y_boundary = y == heatmap_size
    x = np.floor(x)
    y = np.floor(y)
    x[x_boundary] = heatmap_size - 1
    y[y_boundary] = heatmap_size - 1

    valid_loc = (x >= 0) & (y >= 0) & (x < heatmap_size) & (y < heatmap_size)
    vis = kp[..., 2] > 0
    valid = (valid_loc & vis).astype(np.int64)
    heatmaps = (y * heatmap_size + x).astype(np.int64)
    heatmaps[valid == 0] = 0
    return heatmaps, valid


def heatmaps_to_keypoints(maps: np.ndarray, rois: np.ndarray) -> np.ndarray:
    """Heatmap argmax -> (N, K, 4) (x, y, logit, score) in image coords
    (reference :145-212: bicubic upsample to the roi size, argmax, scores
    softmax-normalized by the POOL-resolution sum so scores of different
    absolute sizes stay comparable; golden-tested vs the reference fn)."""
    import cv2

    n, h, w, k = maps.shape
    out = np.zeros((n, k, 4), np.float64)
    for i in range(n):
        x0, y0, x1, y1 = rois[i]
        roi_w = max(x1 - x0, 1.0)
        roi_h = max(y1 - y0, 1.0)
        # upsample each keypoint map to roi size for sub-cell precision
        # (cv2 INTER_CUBIC == torch bicubic align_corners=False: same a=-0.75
        # kernel and half-texel grid)
        up_w = max(int(np.ceil(roi_w)), 1)
        up_h = max(int(np.ceil(roi_h)), 1)
        m = cv2.resize(maps[i], (up_w, up_h), interpolation=cv2.INTER_CUBIC)
        if m.ndim == 2:
            m = m[:, :, None]
        flat = m.reshape(-1, k)
        pos = flat.argmax(0)
        ys, xs = pos // up_w, pos % up_w
        mx = flat.max(0, keepdims=True)
        # normalize with the POOL-resolution sum (reference :186-189)
        pool_sum = np.exp(
            maps[i].reshape(-1, k) - mx
        ).sum(0, keepdims=True)
        probs = np.exp(flat - mx) / pool_sum
        out[i, :, 0] = x0 + (xs + 0.5) * roi_w / up_w
        out[i, :, 1] = y0 + (ys + 0.5) * roi_h / up_h
        out[i, :, 2] = flat[pos, np.arange(k)]
        out[i, :, 3] = probs[pos, np.arange(k)]
    return out
