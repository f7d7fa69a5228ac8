"""ROIAlign parity tests (pattern of reference tests/layers/test_roi_align.py:
compare the op against analytically-known results on tiny inputs)."""

import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.ops.roi_align import (
    assign_boxes_to_levels,
    multilevel_roi_align,
    roi_align,
)


def _ramp_feature(h=16, w=16):
    """feat[y, x] = x in channel 0, y in channel 1 (pixel centers at ints)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([xs, ys], axis=-1)[None]  # (1, H, W, 2)


def test_roi_align_linear_ramp_exact():
    feat = jnp.asarray(_ramp_feature())
    # roi [2, 3, 10, 11] in image coords, scale 1: interior, no clamping
    boxes = jnp.asarray([[2.0, 3.0, 10.0, 11.0]])
    out = roi_align(feat, boxes, jnp.zeros(1, jnp.int32), 1.0, output_size=4, sampling_ratio=2)
    out = np.asarray(out)[0]  # (4, 4, 2)
    bin_w = 8.0 / 4
    # aligned=True: continuous coord x - 0.5 maps to pixel space; on a linear
    # ramp the pooled value equals the sample-average position
    exp_x = 2.0 - 0.5 + (np.arange(4) + 0.5) * bin_w
    exp_y = 3.0 - 0.5 + (np.arange(4) + 0.5) * bin_w
    np.testing.assert_allclose(out[..., 0], np.tile(exp_x, (4, 1)), atol=1e-4)
    np.testing.assert_allclose(out[..., 1], np.tile(exp_y[:, None], (1, 4)), atol=1e-4)


def test_roi_align_constant_feature():
    feat = jnp.full((2, 8, 8, 3), 7.0)
    boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0], [0.5, 0.5, 7.5, 7.5]])
    out = roi_align(feat, boxes, jnp.asarray([0, 1], jnp.int32), 1.0, output_size=2, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_batch_index_selects_image():
    feat = jnp.stack([jnp.zeros((8, 8, 1)), jnp.ones((8, 8, 1))])
    boxes = jnp.asarray([[1.0, 1.0, 6.0, 6.0]] * 2)
    out = roi_align(feat, boxes, jnp.asarray([0, 1], jnp.int32), 1.0, output_size=2, sampling_ratio=1)
    assert np.allclose(np.asarray(out[0]), 0.0)
    assert np.allclose(np.asarray(out[1]), 1.0)


def test_level_assignment():
    boxes = jnp.asarray(
        [
            [0, 0, 56, 56],     # sqrt area 56 -> level 2
            [0, 0, 224, 224],   # canonical -> level 4
            [0, 0, 896, 896],   # -> level 6 clipped to 5
        ],
        jnp.float32,
    )
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5))
    assert list(lv) == [2, 4, 5]


def test_multilevel_matches_single_level():
    feat = jnp.asarray(_ramp_feature(32, 32))
    # small box assigned to the lowest level; pyramid level 0 has stride 4
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # input coords
    feats = [feat, jnp.asarray(_ramp_feature(16, 16))]
    out_multi = multilevel_roi_align(
        feats, [4, 8], boxes, jnp.zeros(1, jnp.int32), output_size=2, sampling_ratio=2
    )
    out_single = roi_align(
        feats[0], boxes, jnp.zeros(1, jnp.int32), 0.25, output_size=2, sampling_ratio=2
    )
    np.testing.assert_allclose(np.asarray(out_multi), np.asarray(out_single), atol=1e-5)
