"""Visualizer smoke tests (reference tests/test_visualizer.py)."""

import numpy as np

from detectron2_centernet_tpu.data import Metadata
from detectron2_centernet_tpu.structures import Boxes, Instances
from detectron2_centernet_tpu.utils.visualizer import Visualizer, colormap


def _image():
    return (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)


def test_colormap_deterministic():
    np.testing.assert_array_equal(colormap(), colormap())
    assert colormap().shape == (74, 3)


def test_draw_instance_predictions():
    inst = Instances((48, 64))
    inst.pred_boxes = Boxes(np.asarray([[5, 5, 30, 30], [10, 10, 60, 40]], np.float32))
    inst.scores = np.asarray([0.9, 0.5], np.float32)
    inst.pred_classes = np.asarray([0, 1])
    masks = np.zeros((2, 48, 64), bool)
    masks[0, 5:30, 5:30] = True
    inst.pred_masks = masks
    meta = Metadata(name="t")
    meta.thing_classes = ["a", "b"]
    vis = Visualizer(_image(), meta)
    out = vis.draw_instance_predictions(inst).get_image()
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8


def test_draw_dataset_dict_and_sem_seg():
    d = {
        "annotations": [
            {"bbox": [5.0, 5.0, 20.0, 15.0], "bbox_mode": 1, "category_id": 0}
        ]
    }
    vis = Visualizer(_image())
    vis.draw_dataset_dict(d)
    sem = np.zeros((48, 64), np.int64)
    sem[:, 32:] = 3
    out = vis.draw_sem_seg(sem).get_image()
    assert out.shape == (48, 64, 3)
