"""Keypoint heatmap codec round trip (reference tests cover keypoints.py)."""

import numpy as np

from detectron2_centernet_tpu.structures import (
    Keypoints,
    heatmaps_to_keypoints,
    keypoints_to_heatmap_targets,
)


def test_keypoints_to_heatmap_targets():
    kp = np.array([[[12.0, 20.0, 2.0], [100.0, 100.0, 0.0]]])  # 1 roi, 2 kps
    rois = np.array([[10.0, 18.0, 26.0, 34.0]])  # 16x16 roi
    heatmaps, valid = keypoints_to_heatmap_targets(kp, rois, heatmap_size=8)
    assert valid[0, 0] == 1
    assert valid[0, 1] == 0  # invisible
    # (12-10)*8/16 = 1, (20-18)*8/16 = 1 -> index 1*8+1
    assert heatmaps[0, 0] == 9


def test_heatmap_decode_finds_peak():
    maps = np.full((1, 14, 14, 1), -5.0, np.float32)
    maps[0, 3, 10, 0] = 8.0
    rois = np.array([[0.0, 0.0, 28.0, 28.0]])
    out = heatmaps_to_keypoints(maps, rois)
    x, y = out[0, 0, 0], out[0, 0, 1]
    assert abs(x - 21) < 2.5 and abs(y - 7) < 2.5
    # score is a softmax prob over all upsampled positions; the peak should
    # dominate the uniform level (1/784 ~ 0.001) by orders of magnitude
    assert out[0, 0, 3] > 0.05


def test_keypoints_container():
    k = Keypoints(np.zeros((3, 17, 3)))
    assert len(k) == 3
    assert len(k[1]) == 1
