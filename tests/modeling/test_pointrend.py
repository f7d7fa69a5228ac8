"""PointRend: point sampling, point head, mask refinement, e2e."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.roi_heads.point_head import (
    point_sample,
    refine_mask_with_points,
    sample_uncertain_points,
)


def test_point_sample_bilinear():
    feat = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # center of pixel (1, 2) in normalized coords
    coords = jnp.asarray([[(2 + 0.5) / 4, (1 + 0.5) / 4]])
    v = point_sample(feat, coords)
    np.testing.assert_allclose(np.asarray(v), [[6.0]], atol=1e-5)


def test_sample_uncertain_points_prefers_boundary():
    logits = jnp.asarray(np.full((16, 16), 10.0, np.float32))
    logits = logits.at[:, 8:].set(-10.0)
    logits = logits.at[:, 7:9].set(0.1)  # uncertain band at x ~ 0.5
    pts = sample_uncertain_points(logits, jax.random.PRNGKey(0), 32, 4, 0.75)
    xs = np.asarray(pts)[:24, 0]  # the importance-sampled portion
    assert (np.abs(xs - 0.5) < 0.2).mean() > 0.55  # ~16 of 128 candidates lie in the band


def test_refine_mask_upscales():
    logits = jnp.asarray(np.random.RandomState(0).randn(7, 7).astype(np.float32))
    fine = jnp.zeros((14, 14, 4), jnp.float32)
    out = refine_mask_with_points(
        logits, fine, lambda fv, cv: cv * 0 + 5.0, num_points=16, steps=2
    )
    assert out.shape == (28, 28)
    # exactly 16 points per step were overwritten with 5.0
    assert (np.asarray(out) == 5.0).sum() >= 16


def test_pointrend_rcnn_e2e():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NAME = "PointRendMaskHead"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 60
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 30
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 40
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.POINT_HEAD.FC_DIM = 16
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 1
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    cfg.TPU.DTYPE = "float32"
    m = build_model(cfg)
    assert m.point_rend_on
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    assert "point_head" in v["params"]

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 3, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 3)), jnp.int32),
        "gt_valid": jnp.ones((1, 3), bool),
        "gt_masks": jnp.asarray((rng.rand(1, 3, 16, 16) > 0.5).astype(np.uint8)),
        "rng": jax.random.PRNGKey(2),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_mask_point" in ld and np.isfinite(float(total))

    dets = m.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    # one subdivision step doubles the 14x14 mask to 28x28
    assert dets["masks"].shape == (1, 4, 28, 28)


def test_coarse_mask_head_pointrend_combo():
    """The reference PointRend combo (ROI_HEADS.NAME=PointRendROIHeads +
    ROI_MASK_HEAD.NAME=CoarseMaskHead + POINT_HEAD_ON): the FC coarse head
    emits OUTPUT_SIDE_RESOLUTION masks and the point head refines them at
    inference through SUBDIVISION_STEPS 2x rounds."""
    cfg = get_cfg()
    cfg.merge_from_file(
        "projects/PointRend/configs/InstanceSegmentation/Base-PointRend-RCNN-FPN.yaml"
    )
    cfg.DATASETS.TRAIN = ()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 8
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 3
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 16
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 2
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 32
    cfg.MODEL.ROI_MASK_HEAD.FC_DIM = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 4
    cfg.TPU.DTYPE = "float32"
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    # the FC coarse head is constructed (not the conv-upsample head)
    assert "coarse_mask_fc1" in v["params"]["mask_head"]

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32)
    dets = m.predict_fn(v, img)
    # 7x7 coarse -> 2 subdivision steps -> 28x28 refined masks
    assert dets["masks"].shape == (1, 4, 28, 28)

    boxes = rng.rand(1, 2, 4).astype(np.float32) * 24
    boxes[..., 2:] = boxes[..., :2] + 16
    batch = {
        "image": img,
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 2)), jnp.int32),
        "gt_valid": jnp.ones((1, 2), bool),
        "gt_masks": jnp.asarray(rng.rand(1, 8, 16, 16) > 0.5, jnp.float32),
        "rng": jax.random.PRNGKey(5),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_mask_point" in ld and "loss_mask" in ld
    assert np.isfinite(float(total))
