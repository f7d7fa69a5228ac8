"""Mask head, gt-mask cropping, Mask R-CNN e2e."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.roi_heads.mask_head import (
    crop_gt_masks,
    mask_rcnn_loss,
)
from detectron2_centernet_tpu.structures.masks import (
    BitMasks,
    PolygonMasks,
    paste_masks_in_image,
    polygons_to_bitmask,
    rasterize_in_box,
)


def test_polygons_to_bitmask_square():
    m = polygons_to_bitmask([np.array([2, 2, 8, 2, 8, 8, 2, 8])], 10, 10)
    assert m[5, 5] and not m[0, 0]
    assert 30 <= m.sum() <= 49  # ~6x6 square


def test_rasterize_in_box_identity():
    # polygon exactly fills the box -> raster is (almost) all ones
    r = rasterize_in_box(
        [np.array([0, 0, 10, 0, 10, 10, 0, 10])], np.array([0, 0, 10, 10]), 8
    )
    assert r.mean() > 0.85


def test_crop_gt_masks_full_box_is_identity():
    rng = np.random.RandomState(0)
    raster = (rng.rand(1, 16, 16) > 0.5).astype(np.float32)
    gt_boxes = jnp.asarray([[10.0, 10.0, 42.0, 42.0]])
    # roi == gt box -> crop should reproduce the raster (downsampled to 16)
    out = crop_gt_masks(
        jnp.asarray(raster), gt_boxes, jnp.zeros(1, jnp.int32), gt_boxes, 16
    )
    # interior agrees (borders differ by half-pixel sampling)
    inner = np.abs(np.asarray(out)[0, 2:-2, 2:-2] - raster[0, 2:-2, 2:-2])
    assert inner.mean() < 0.3


def test_mask_rcnn_loss_perfect_prediction():
    s, p, c = 4, 8, 3
    gt = (np.random.RandomState(0).rand(s, p, p) > 0.5).astype(np.float32)
    logits = jnp.asarray((gt * 2 - 1) * 20.0)[..., None] * jnp.ones((1, 1, 1, c))
    loss = mask_rcnn_loss(
        logits, jnp.asarray(gt), jnp.zeros(s, jnp.int32), jnp.ones(s)
    )
    assert float(loss) < 1e-3


def test_paste_masks_in_image():
    mask = np.ones((1, 4, 4), np.float32)
    out = paste_masks_in_image(mask, np.array([[2.0, 3.0, 6.0, 7.0]]), (10, 10))
    assert out[0, 4, 3]
    assert not out[0, 0, 0]
    assert out.sum() == 16


def test_bitmasks_polygonmasks_roundtrip():
    polys = PolygonMasks([[np.array([1, 1, 7, 1, 7, 7, 1, 7])]])
    bm = BitMasks.from_polygon_masks(polys, 10, 10)
    assert len(bm) == 1 and bm.nonempty().all()
    bbox = np.asarray(bm.get_bounding_boxes().tensor)[0]
    assert bbox[0] <= 1.5 and bbox[2] >= 6.5


def test_mask_rcnn_end_to_end():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 50
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 50
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION = 7
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 4, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 4)), jnp.int32),
        "gt_valid": jnp.ones((1, 4), bool),
        "gt_masks": jnp.asarray((rng.rand(1, 4, 16, 16) > 0.5).astype(np.uint8)),
        "rng": jax.random.PRNGKey(2),
    }
    total, (ld, _) = model.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_mask" in ld and np.isfinite(float(ld["loss_mask"]))

    dets = model.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert "masks" in dets
    assert dets["masks"].shape == (1, 10, 14, 14)
    out = model.postprocess({k: np.asarray(x) for k, x in dets.items()}, None, [(64, 64)])
    inst = out[0]["instances"]
    if len(inst):
        assert inst.pred_masks.shape[1:] == (64, 64)
