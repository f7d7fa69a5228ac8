import numpy as np
import pytest

from detectron2_centernet_tpu.structures import (
    Boxes,
    BoxMode,
    matched_boxlist_iou,
    pairwise_ioa,
    pairwise_iou,
)


def test_boxmode_xyxy_xywh_roundtrip():
    xyxy = np.array([[10.0, 20.0, 50.0, 100.0], [0.0, 0.0, 1.0, 1.0]])
    xywh = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(xywh, [[10, 20, 40, 80], [0, 0, 1, 1]])
    back = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(back, xyxy)


def test_boxmode_list_input():
    box = [10.0, 20.0, 40.0, 80.0]
    out = BoxMode.convert(box, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    assert isinstance(out, list)
    assert out == [10.0, 20.0, 50.0, 100.0]


def test_boxmode_xywha():
    # axis-aligned rotated box (angle 0) converts to its own hull
    box = np.array([[50.0, 50.0, 20.0, 10.0, 0.0]])
    out = BoxMode.convert(box, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(out, [[40, 45, 60, 55]])
    # 90 degrees swaps w/h
    box = np.array([[50.0, 50.0, 20.0, 10.0, 90.0]])
    out = BoxMode.convert(box, BoxMode.XYWHA_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(out, [[45, 40, 55, 60]], atol=1e-5)


def test_pairwise_iou():
    b1 = Boxes(np.array([[0.0, 0.0, 10.0, 10.0]]))
    b2 = Boxes(np.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]]))
    iou = pairwise_iou(b1, b2)
    np.testing.assert_allclose(iou, [[1.0, 25.0 / 175.0, 0.0]], rtol=1e-6)


def test_pairwise_ioa():
    b1 = Boxes(np.array([[0.0, 0.0, 10.0, 10.0]]))
    b2 = Boxes(np.array([[5.0, 5.0, 10.0, 10.0]]))
    np.testing.assert_allclose(pairwise_ioa(b1, b2), [[1.0]])


def test_matched_iou():
    b1 = Boxes(np.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 4.0, 4.0]]))
    b2 = Boxes(np.array([[0.0, 0.0, 10.0, 10.0], [2.0, 2.0, 6.0, 6.0]]))
    out = matched_boxlist_iou(b1, b2)
    np.testing.assert_allclose(out, [1.0, 4.0 / 28.0], rtol=1e-6)


def test_boxes_clip_area_nonempty():
    b = Boxes(np.array([[-5.0, -5.0, 5.0, 5.0], [1.0, 1.0, 1.0, 8.0]]))
    assert b.nonempty().tolist() == [True, False]
    b.clip((4, 6))  # (h, w)
    np.testing.assert_allclose(b.tensor[0], [0, 0, 5, 4])
    np.testing.assert_allclose(b.area(), [5 * 4, 0])


def test_boxes_cat_and_index():
    b = Boxes.cat([Boxes(np.zeros((2, 4))), Boxes(np.ones((3, 4)))])
    assert len(b) == 5
    sel = b[np.array([True, False, True, False, False])]
    assert len(sel) == 2
    assert len(b[0]) == 1
    with pytest.raises(AssertionError):
        Boxes(np.zeros((2, 5)))
