"""Geometric transform family vs reference semantics
(augmentation_impl.py:211-417, transform.py:139-313)."""

import numpy as np

from detectron2_centernet_tpu.data.detection_utils import (
    apply_affine_to_boxes,
    apply_affine_to_points,
)
from detectron2_centernet_tpu.data.transforms import (
    RandomCropAug,
    RandomCropCategoryAreaConstraint,
    RandomExtentAug,
    RandomRotationAug,
    compose_affine,
    window_to_output_transform,
)


def test_rotation_matrix_matches_cv2_semantics():
    """90° CCW around the center with expand: (x, y) -> (y, W-1-x)-style
    mapping, canvas swaps to (W, H) (reference RotationTransform)."""
    rot = RandomRotationAug(angle=(90.0, 90.0), expand=True)
    h, w = 40, 60
    m, (nh, nw) = rot(h, w, np.random.RandomState(0))
    assert (nh, nw) == (w, h)
    # corners map onto the expanded canvas corners
    pts = np.array([[0.0, 0.0], [w, 0.0], [w, h], [0.0, h]])
    out = apply_affine_to_points(m, pts)
    assert np.allclose(out.min(axis=0), [0, 0], atol=1e-6)
    assert np.allclose(out.max(axis=0), [nw, nh], atol=1e-6)
    # CCW in image coords: the top-right source corner goes to the top-left
    assert np.allclose(out[1], [0.0, 0.0], atol=1e-6)


def test_rotation_box_is_tight_corner_envelope():
    rot = RandomRotationAug(angle=(30.0, 30.0), expand=True)
    m, _ = rot(100, 100, np.random.RandomState(1))
    box = np.array([[20.0, 30.0, 60.0, 50.0]])
    got = apply_affine_to_boxes(m, box)[0]
    corners = np.array(
        [[20, 30], [60, 30], [20, 50], [60, 50]], np.float64
    )
    wc = apply_affine_to_points(m, corners)
    expected = np.concatenate([wc.min(axis=0), wc.max(axis=0)])
    np.testing.assert_allclose(got, expected, atol=1e-9)


def test_random_crop_size_semantics():
    rng = np.random.RandomState(2)
    assert RandomCropAug("relative", (0.5, 0.5)).get_crop_size(100, 200, rng) == (50, 100)
    ch, cw = RandomCropAug("relative_range", (0.5, 0.5)).get_crop_size(100, 200, rng)
    assert 50 <= ch <= 100 and 100 <= cw <= 200
    assert RandomCropAug("absolute", (30, 500)).get_crop_size(100, 200, rng) == (30, 200)
    ch, cw = RandomCropAug("absolute_range", (20, 60)).get_crop_size(100, 200, rng)
    assert 20 <= ch <= 60 and 20 <= cw <= 60
    # sampled windows stay inside the image
    for _ in range(20):
        x0, y0, w_, h_ = RandomCropAug("relative_range", (0.3, 0.3))(100, 200, rng)
        assert 0 <= x0 and x0 + w_ <= 200 and 0 <= y0 and y0 + h_ <= 100


def test_category_area_constraint_retries():
    """A window dominated by one category must be rejected when a valid
    alternative exists (reference :318-365)."""
    rng = np.random.RandomState(3)
    sem = np.zeros((100, 100), np.int64)
    sem[:, 50:] = 1  # two categories split down the middle
    crop = RandomCropCategoryAreaConstraint(
        "absolute", (50, 50), single_category_max_area=0.9
    )
    for _ in range(10):
        x0, y0, cw, ch = crop(100, 100, rng, sem_seg=sem)
        window = sem[y0 : y0 + ch, x0 : x0 + cw]
        _, counts = np.unique(window, return_counts=True)
        assert len(counts) > 1 and counts.max() < counts.sum() * 0.9


def test_random_extent_window_and_warp():
    rng = np.random.RandomState(4)
    ext = RandomExtentAug((1.0, 1.0), (0.0, 0.0))
    x0, y0, cw, ch = ext(50, 70, rng)
    # unit scale, zero shift -> the full image extent
    np.testing.assert_allclose([x0, y0, cw, ch], [0, 0, 70, 50], atol=1e-9)
    m = window_to_output_transform((x0, y0, cw, ch), (25, 35))
    out = apply_affine_to_points(m, np.array([[0.0, 0.0], [70.0, 50.0]]))
    np.testing.assert_allclose(out, [[0, 0], [35, 25]], atol=1e-9)


def test_compose_affine_order():
    a = np.array([[2.0, 0, 1], [0, 2.0, 2]])  # scale then shift
    b = np.array([[1.0, 0, 10], [0, 1.0, 20]])  # shift
    m = compose_affine(a, b)  # b first, then a
    pt = apply_affine_to_points(m, np.array([[1.0, 1.0]]))[0]
    np.testing.assert_allclose(pt, [(1 + 10) * 2 + 1, (1 + 20) * 2 + 2])


def test_mapper_crop_keeps_boxes_consistent():
    """End-to-end: a crop+flip mapper run maps gt boxes with the same matrix
    as the image."""
    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper

    cfg = get_cfg()
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.CROP.TYPE = "relative"
    cfg.INPUT.CROP.SIZE = [0.8, 0.8]
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    mapper = DatasetMapper(cfg, is_train=True)
    img = np.zeros((100, 100, 3), np.uint8)
    img[40:60, 40:60] = 255  # a bright square co-located with the gt box
    d = {
        "image": img, "height": 100, "width": 100, "image_id": 1,
        "annotations": [
            {"bbox": [40, 40, 20, 20], "bbox_mode": 1, "category_id": 0, "iscrowd": 0}
        ],
    }
    out = mapper(d, np.random.RandomState(5))
    assert out["image"].shape == (64, 64, 3)
    assert out["gt_valid"][0]
    x0, y0, x1, y1 = out["gt_boxes"][0]
    # the warped image content inside the warped box must be the bright square
    inner = out["image"][int(y0) + 1 : int(y1) - 1, int(x0) + 1 : int(x1) - 1]
    assert inner.size and inner.mean() > 200, (out["gt_boxes"][0], inner.mean())
    outer = out["image"].sum() - inner.sum() * (inner.size / inner.size)
    assert out["image"][: max(int(y0) - 2, 0)].mean() < 30


def test_fast_letterbox_geometry_matches_effective_matrix():
    """The resize+paste eval letterbox reports the EXACT affine it applied:
    a bright square's pixels land where m_eff says its box lands (<1.5 px),
    and the fast path stays close to the warpAffine formulation."""
    import cv2

    from detectron2_centernet_tpu.data.detection_utils import (
        apply_affine_to_boxes,
        fast_letterbox,
        warp_image,
    )
    from detectron2_centernet_tpu.data.transforms import letterbox_transform

    img = np.zeros((480, 640, 3), np.uint8)
    img[120:360, 200:440] = 255
    canvas, m_eff = fast_letterbox(img, (512, 512))
    assert canvas.shape == (512, 512, 3) and canvas.dtype == np.uint8

    # measured content box vs the box predicted by m_eff
    ys, xs = np.nonzero(canvas[..., 0] > 127)
    got = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    want = apply_affine_to_boxes(m_eff, np.array([[200.0, 120, 440, 360]]))[0]
    np.testing.assert_allclose(got, want, atol=1.5)

    # pixel content close to the warpAffine reference formulation
    m = letterbox_transform(480, 640, (512, 512))
    ref = warp_image(img, m, (512, 512))
    diff = np.abs(canvas.astype(np.int16) - ref.astype(np.int16))
    assert (diff > 64).mean() < 0.01  # only edge pixels may differ

    # grayscale input keeps its rank
    g, mg = fast_letterbox(img[..., 0], (512, 512))
    assert g.shape == (512, 512)
    np.testing.assert_allclose(mg, m_eff)


def test_eval_mapper_uses_fast_letterbox_and_exact_mode_disables():
    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper

    img = (np.random.RandomState(0).rand(100, 50, 3) * 255).astype(np.uint8)
    d = {"image": img, "height": 100, "width": 50, "image_id": 7}

    cfg = get_cfg()
    cfg.INPUT.TEST_SIZE = (64, 64)
    fast = DatasetMapper(cfg, is_train=False)(dict(d))

    cfg2 = cfg.clone()
    cfg2.INPUT.FAST_LETTERBOX = False
    exact = DatasetMapper(cfg2, is_train=False)(dict(d))

    assert fast["image"].shape == exact["image"].shape
    # both matrices un-map a canvas point to nearly the same source point
    from detectron2_centernet_tpu.data.detection_utils import (
        invert_affine,
        apply_affine_to_points,
    )

    pt = np.array([[32.0, 32.0]])
    src_fast = apply_affine_to_points(invert_affine(fast["warp"].astype(np.float64)), pt)
    src_exact = apply_affine_to_points(invert_affine(exact["warp"].astype(np.float64)), pt)
    np.testing.assert_allclose(src_fast, src_exact, atol=2.0)

    cfg3 = cfg.clone()
    cfg3.TEST.EXACT_MODE = True
    m3 = DatasetMapper(cfg3, is_train=False)
    assert not m3.fast_letterbox
