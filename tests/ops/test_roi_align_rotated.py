"""ROIAlignRotated + device rotated IoU/NMS vs host references."""

import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.ops.roi_align import roi_align
from detectron2_centernet_tpu.ops.roi_align_rotated import (
    nms_rotated_fixed,
    pairwise_iou_rotated_jnp,
    roi_align_rotated,
)
from detectron2_centernet_tpu.structures.rotated_boxes import (
    nms_rotated,
    pairwise_iou_rotated,
)


def test_rotated_iou_matches_host():
    rng = np.random.RandomState(0)
    b1 = np.stack([rng.rand(6) * 50 + 20, rng.rand(6) * 50 + 20,
                   rng.rand(6) * 30 + 5, rng.rand(6) * 30 + 5,
                   rng.rand(6) * 360 - 180], 1)
    b2 = np.stack([rng.rand(5) * 50 + 20, rng.rand(5) * 50 + 20,
                   rng.rand(5) * 30 + 5, rng.rand(5) * 30 + 5,
                   rng.rand(5) * 360 - 180], 1)
    got = np.asarray(pairwise_iou_rotated_jnp(jnp.asarray(b1), jnp.asarray(b2)))
    want = pairwise_iou_rotated(b1, b2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotated_nms_matches_host():
    rng = np.random.RandomState(1)
    boxes = np.stack([rng.rand(12) * 40 + 20, rng.rand(12) * 40 + 20,
                      rng.rand(12) * 20 + 8, rng.rand(12) * 20 + 8,
                      rng.rand(12) * 90 - 45], 1)
    scores = rng.rand(12)
    keep, valid = nms_rotated_fixed(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.3, 12
    )
    got = list(np.asarray(keep)[np.asarray(valid)])
    want = list(nms_rotated(boxes, scores, 0.3))
    assert got == want


def test_rotated_nms_per_class_keeps_cross_class_overlaps():
    # two identical boxes, different classes: per-class NMS keeps both;
    # class-blind NMS would drop the lower-scored one
    boxes = np.array([[30, 30, 20, 10, 15.0]] * 2 + [[30, 30, 20, 10, 17.0]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    classes = np.array([0, 1, 0], np.int32)
    keep, valid = nms_rotated_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3,
        classes=jnp.asarray(classes),
    )
    kept = sorted(np.asarray(keep)[np.asarray(valid)].tolist())
    # box2 (class 0, iou~0.9 with box0) suppressed; box1 (class 1) survives
    assert kept == [0, 1]
    keep_blind, valid_blind = nms_rotated_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3
    )
    assert sorted(np.asarray(keep_blind)[np.asarray(valid_blind)].tolist()) == [0]


def test_roi_align_rotated_zero_angle_matches_axis_aligned():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.rand(1, 24, 24, 4), jnp.float32)
    # cx, cy, w, h, 0 deg == XYXY box
    rot = jnp.asarray([[12.0, 10.0, 8.0, 6.0, 0.0]])
    xyxy = jnp.asarray([[8.0, 7.0, 16.0, 13.0]])
    out_rot = roi_align_rotated(feat, rot, jnp.zeros(1, jnp.int32), 1.0, 4, 2)
    out_axis = roi_align(feat, xyxy, jnp.zeros(1, jnp.int32), 1.0, 4, 2)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out_axis), atol=1e-4)


def test_roi_align_rotated_90deg_transposes():
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    sq0 = jnp.asarray([[16.0, 16.0, 10.0, 10.0, 0.0]])
    sq90 = jnp.asarray([[16.0, 16.0, 10.0, 10.0, 90.0]])
    o0 = np.asarray(roi_align_rotated(feat, sq0, jnp.zeros(1, jnp.int32), 1.0, 6, 2))[0, :, :, 0]
    o90 = np.asarray(roi_align_rotated(feat, sq90, jnp.zeros(1, jnp.int32), 1.0, 6, 2))[0, :, :, 0]
    # rotating the sampling grid by -90° == rotating the pooled map
    np.testing.assert_allclose(o90, np.rot90(o0, k=-1), atol=1e-4)
