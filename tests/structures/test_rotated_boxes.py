"""Rotated box IoU / NMS correctness (reference tests/structures/
test_rotated_boxes.py randomized cross-checks)."""

import numpy as np

from detectron2_centernet_tpu.structures.rotated_boxes import (
    RotatedBoxes,
    nms_rotated,
    pairwise_iou_rotated,
    rotated_box_vertices,
)
from detectron2_centernet_tpu.ops.nms import pairwise_iou_xyxy
import jax.numpy as jnp


def test_vertices_axis_aligned():
    v = rotated_box_vertices(np.array([[10, 10, 4, 2, 0]]))
    xs = sorted(v[0, :, 0])
    ys = sorted(v[0, :, 1])
    np.testing.assert_allclose(xs, [8, 8, 12, 12])
    np.testing.assert_allclose(ys, [9, 9, 11, 11])


def test_iou_matches_axis_aligned():
    rng = np.random.RandomState(0)
    for _ in range(20):
        c = rng.rand(2, 2) * 50
        wh = rng.rand(2, 2) * 30 + 2
        r1 = np.array([[c[0, 0], c[0, 1], wh[0, 0], wh[0, 1], 0.0]])
        r2 = np.array([[c[1, 0], c[1, 1], wh[1, 0], wh[1, 1], 0.0]])
        xy1 = np.array([[c[0, 0] - wh[0, 0] / 2, c[0, 1] - wh[0, 1] / 2,
                         c[0, 0] + wh[0, 0] / 2, c[0, 1] + wh[0, 1] / 2]])
        xy2 = np.array([[c[1, 0] - wh[1, 0] / 2, c[1, 1] - wh[1, 1] / 2,
                         c[1, 0] + wh[1, 0] / 2, c[1, 1] + wh[1, 1] / 2]])
        expected = np.asarray(pairwise_iou_xyxy(jnp.asarray(xy1), jnp.asarray(xy2)))
        got = pairwise_iou_rotated(r1, r2)
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_iou_rotation_invariance():
    # same box rotated by the same angle -> IoU 1
    b = np.array([[20, 20, 10, 4, 37.0]])
    np.testing.assert_allclose(pairwise_iou_rotated(b, b)[0, 0], 1.0, atol=1e-9)
    # 90-degree rotation of a square = same square
    sq = np.array([[5, 5, 6, 6, 0.0]])
    sq90 = np.array([[5, 5, 6, 6, 90.0]])
    np.testing.assert_allclose(pairwise_iou_rotated(sq, sq90)[0, 0], 1.0, atol=1e-9)


def test_45_degree_known_value():
    # unit squares at 0 and 45 deg share area 2*(sqrt(2)-1) ~ 0.8284
    a = np.array([[0, 0, 2, 2, 0.0]])
    b = np.array([[0, 0, 2, 2, 45.0]])
    inter = 8 * (np.sqrt(2) - 1)
    expected = inter / (8 - inter)
    np.testing.assert_allclose(pairwise_iou_rotated(a, b)[0, 0], expected, atol=1e-6)


def test_nms_rotated():
    boxes = np.array(
        [[10, 10, 10, 10, 0], [11, 11, 10, 10, 5], [50, 50, 10, 10, 30]], np.float64
    )
    keep = nms_rotated(boxes, np.array([0.9, 0.8, 0.7]), 0.3)
    assert list(keep) == [0, 2]


def test_rotated_boxes_clip():
    rb = RotatedBoxes(np.array([[2, 2, 10, 10, 0.5], [20, 20, 10, 10, 45.0]]))
    rb.clip((30, 30))
    # near-axis-aligned box clipped; rotated one untouched
    assert rb.tensor[0, 2] < 10
    np.testing.assert_allclose(rb.tensor[1], [20, 20, 10, 10, 45.0])
