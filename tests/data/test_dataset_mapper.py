"""DatasetMapper static-shape contract + affine warp correctness."""

import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper
from detectron2_centernet_tpu.data.detection_utils import (
    apply_affine_to_boxes,
    get_affine_transform,
    invert_affine,
)
from detectron2_centernet_tpu.structures import BoxMode


def _fake_dict(h=80, w=120, n=3):
    rng = np.random.RandomState(7)
    image = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    annos = []
    for i in range(n):
        x, y = rng.randint(0, w // 2), rng.randint(0, h // 2)
        annos.append(
            {
                "bbox": [float(x), float(y), 20.0, 15.0],
                "bbox_mode": BoxMode.XYWH_ABS,
                "category_id": i % 2,
                "iscrowd": 0,
            }
        )
    return {"image": image, "height": h, "width": w, "image_id": 5, "annotations": annos}


def test_train_mapper_shapes():
    cfg = get_cfg()
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    cfg.MODEL.CENTERNET.MAX_OBJS = 16
    mapper = DatasetMapper(cfg, is_train=True)
    out = mapper(_fake_dict(), rng=np.random.RandomState(0))
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype in (np.uint8, np.float32)  # uint8 when photometric is on-device
    assert out["gt_boxes"].shape == (16, 4)
    assert out["gt_classes"].shape == (16,)
    assert out["gt_valid"].shape == (16,)
    assert out["warp"].shape == (2, 3)
    assert out["gt_valid"].sum() == 3


def test_eval_mapper_letterbox_invertible():
    cfg = get_cfg()
    cfg.INPUT.TEST_SIZE = (64, 64)
    mapper = DatasetMapper(cfg, is_train=False)
    out = mapper(_fake_dict(h=100, w=50))
    assert out["image"].shape == (64, 64, 3)
    m = out["warp"].astype(np.float64)
    minv = invert_affine(m)
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    rt = apply_affine_to_boxes(minv, apply_affine_to_boxes(m, boxes))
    np.testing.assert_allclose(rt, boxes, atol=1e-6)


def test_affine_letterbox_centered():
    # 100x50 (h x w) source, 64x64 target: scale = 64/100, content centered in x
    m = get_affine_transform(np.array([25.0, 50.0]), 100.0, (64, 64))
    # source center maps to output center
    c = m[:, :2] @ np.array([25.0, 50.0]) + m[:, 2]
    np.testing.assert_allclose(c, [32.0, 32.0])
    # isotropic scale
    assert np.isclose(m[0, 0], 64 / 100) and np.isclose(m[1, 1], 64 / 100)
