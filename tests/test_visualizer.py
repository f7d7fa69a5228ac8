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


def _masked_instances():
    inst = Instances((48, 64))
    inst.pred_boxes = Boxes(np.asarray([[5, 5, 30, 30]], np.float32))
    inst.scores = np.asarray([0.9], np.float32)
    inst.pred_classes = np.asarray([0])
    masks = np.zeros((1, 48, 64), bool)
    masks[0, 8:28, 8:28] = True
    inst.pred_masks = masks
    return inst, masks


def test_image_bw_mode():
    """ColorMode.IMAGE_BW: everything outside the predicted-mask union goes
    grayscale; masked pixels keep the original colors (reference
    visualizer.py:388-392 + _create_grayscale_image)."""
    from detectron2_centernet_tpu.utils.visualizer import ColorMode

    img = _image()
    inst, masks = _masked_instances()
    vis = Visualizer(img, instance_mode=ColorMode.IMAGE_BW)
    out = vis.draw_instance_predictions(inst).get_image()
    # an untouched far-away region must be gray (r == g == b)
    region = out[40:46, 50:60]
    assert (region[..., 0] == region[..., 1]).all()
    assert (region[..., 1] == region[..., 2]).all()
    # the original image there is NOT gray
    orig = img[40:46, 50:60]
    assert not (orig[..., 0] == orig[..., 1]).all()


def test_segmentation_mode_uses_thing_colors():
    """ColorMode.SEGMENTATION: instance colors come from metadata
    thing_colors (jittered), not the palette (reference :378-383)."""
    from detectron2_centernet_tpu.utils.visualizer import ColorMode

    meta = Metadata(name="t2")
    meta.thing_classes = ["a"]
    meta.thing_colors = [(255, 0, 0)]
    inst, masks = _masked_instances()
    img = np.zeros((48, 64, 3), np.uint8)
    vis = Visualizer(img, meta, instance_mode=ColorMode.SEGMENTATION)
    out = vis.draw_instance_predictions(inst).get_image()
    interior = out[14:22, 14:22].reshape(-1, 3).mean(axis=0)
    # red-dominated fill at alpha 0.8 over black: r >> g, b
    assert interior[0] > 100 and interior[0] > interior[1] + 40
    assert interior[0] > interior[2] + 40


def test_mask_polygon_outline():
    """Mask boundary gets a darker outline (reference draw_binary_mask
    contours at brightness -0.7)."""
    inst, masks = _masked_instances()
    img = np.full((48, 64, 3), 200, np.uint8)
    vis = Visualizer(img)
    out = vis.draw_instance_predictions(inst).get_image()
    boundary = out[8, 8:28].astype(int).mean(axis=-1)
    interior = out[18, 12:24].astype(int).mean(axis=-1)
    # boundary strictly darker than the alpha-filled interior
    assert boundary.mean() < interior.mean() - 20


def test_sem_seg_stuff_colors():
    meta = Metadata(name="t3")
    meta.stuff_classes = ["sky", "road"]
    meta.stuff_colors = [(0, 0, 255), (0, 255, 0)]
    seg = np.zeros((48, 64), np.int32)
    seg[:, 32:] = 1
    vis = Visualizer(np.zeros((48, 64, 3), np.uint8), meta)
    out = vis.draw_sem_seg(seg, alpha=1.0).get_image()
    assert out[10, 10, 2] == 255 and out[10, 50, 1] == 255
