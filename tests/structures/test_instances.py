import numpy as np
import pytest

from detectron2_centernet_tpu.structures import Boxes, Instances


def test_fields_and_indexing():
    inst = Instances((480, 640))
    inst.pred_boxes = Boxes(np.arange(12, dtype=np.float32).reshape(3, 4))
    inst.scores = np.array([0.9, 0.5, 0.1])
    assert len(inst) == 3
    assert inst.has("scores") and not inst.has("pred_classes")

    sub = inst[np.array([True, False, True])]
    assert len(sub) == 2
    np.testing.assert_allclose(sub.scores, [0.9, 0.1])
    assert sub.image_size == (480, 640)

    one = inst[1]
    assert len(one) == 1
    np.testing.assert_allclose(one.scores, [0.5])


def test_length_mismatch_rejected():
    inst = Instances((10, 10))
    inst.scores = np.zeros(3)
    with pytest.raises(AssertionError):
        inst.pred_classes = np.zeros(4)


def test_cat():
    a = Instances((10, 10), scores=np.array([1.0]), pred_boxes=Boxes(np.zeros((1, 4))))
    b = Instances((10, 10), scores=np.array([2.0, 3.0]), pred_boxes=Boxes(np.ones((2, 4))))
    c = Instances.cat([a, b])
    assert len(c) == 3
    np.testing.assert_allclose(c.scores, [1, 2, 3])
    assert len(c.pred_boxes) == 3


def test_missing_field_raises():
    inst = Instances((10, 10))
    with pytest.raises(AttributeError):
        _ = inst.not_there
