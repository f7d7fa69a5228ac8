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


def test_draw_keypoints_and_skeleton():
    inst = Instances((48, 64))
    inst.pred_boxes = Boxes(np.asarray([[2, 2, 60, 46]], np.float32))
    inst.scores = np.asarray([0.8], np.float32)
    inst.pred_classes = np.asarray([0])
    kpts = np.zeros((1, 17, 3), np.float32)
    kpts[0, :, 0] = np.linspace(5, 60, 17)
    kpts[0, :, 1] = np.linspace(5, 40, 17)
    kpts[0, :, 2] = 1.0
    inst.pred_keypoints = kpts
    out = Visualizer(_image()).draw_instance_predictions(inst).get_image()
    assert out.shape == (48, 64, 3)


def test_draw_rotated_predictions():
    from detectron2_centernet_tpu.structures import RotatedBoxes

    inst = Instances((48, 64))
    inst.pred_boxes = RotatedBoxes(
        np.asarray([[32, 24, 30, 12, 30.0]], np.float32)
    )
    inst.scores = np.asarray([0.7], np.float32)
    inst.pred_classes = np.asarray([2])
    out = Visualizer(_image()).draw_rotated_instance_predictions(inst).get_image()
    assert out.shape == (48, 64, 3)


def test_draw_panoptic_seg():
    seg = np.zeros((48, 64), np.int32)
    seg[:, :32] = 1
    seg[10:30, 40:60] = 2
    info = [
        {"id": 1, "category_id": 0, "isthing": False},
        {"id": 2, "category_id": 1, "isthing": True},
    ]
    meta = Metadata(name="p")
    meta.thing_classes = ["a", "b"]
    meta.stuff_classes = ["sky", "road"]
    out = Visualizer(_image(), meta).draw_panoptic_seg(seg, info).get_image()
    assert out.shape == (48, 64, 3)


def test_video_visualizer_color_consistency():
    from detectron2_centernet_tpu.utils.visualizer import VideoVisualizer

    vv = VideoVisualizer()
    inst1 = Instances((48, 64))
    inst1.pred_boxes = Boxes(np.asarray([[5, 5, 30, 30]], np.float32))
    inst1.pred_classes = np.asarray([0])
    inst1.scores = np.asarray([0.9], np.float32)
    vv.draw_instance_predictions(_image(), inst1)
    c1 = vv._prev_colors.copy()
    # same object moved slightly -> keeps its color
    inst2 = Instances((48, 64))
    inst2.pred_boxes = Boxes(np.asarray([[7, 6, 32, 31]], np.float32))
    inst2.pred_classes = np.asarray([0])
    inst2.scores = np.asarray([0.9], np.float32)
    vv.draw_instance_predictions(_image(), inst2)
    assert np.allclose(vv._prev_colors, c1)
    # a far-away new object gets a different color
    inst3 = Instances((48, 64))
    inst3.pred_boxes = Boxes(
        np.asarray([[7, 6, 32, 31], [50, 35, 62, 46]], np.float32)
    )
    inst3.pred_classes = np.asarray([0, 0])
    inst3.scores = np.asarray([0.9, 0.8], np.float32)
    vv.draw_instance_predictions(_image(), inst3)
    assert np.allclose(vv._prev_colors[0], c1[0])
    assert not np.allclose(vv._prev_colors[1], c1[0])
