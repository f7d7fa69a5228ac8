"""PanopticFPN end-to-end loss + predict."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model


def test_panoptic_fpn_e2e():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
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
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.TEST.DETECTIONS_PER_IMAGE = 5
    cfg.TPU.DTYPE = "float32"

    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    assert "sem_seg_head" in v["params"]

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 4, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 4)), jnp.int32),
        "gt_valid": jnp.ones((1, 4), bool),
        "gt_masks": jnp.asarray((rng.rand(1, 4, 16, 16) > 0.5).astype(np.uint8)),
        "sem_seg": jnp.zeros((1, 64, 64), jnp.int32),
        "rng": jax.random.PRNGKey(2),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_sem_seg" in ld and "loss_mask" in ld and "loss_rpn_cls" in ld
    assert np.isfinite(float(total))

    dets = m.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert dets["sem_seg"].shape == (1, 64, 64, 4)
    out = m.postprocess({k: np.asarray(x) for k, x in dets.items()}, None, [(64, 64)])
    assert "panoptic_seg" in out[0] and "sem_seg" in out[0]


def test_panoptic_instance_loss_weight_scaling():
    """Only the ROI-head detector losses are scaled by
    PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT; RPN proposal losses and loss_sem_seg
    pass through unweighted (reference panoptic_fpn.py:105-107)."""
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
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
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 1
    cfg.MODEL.ROI_MASK_HEAD.CONV_DIM = 16
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 4
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT = 0.25

    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 4, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 4)), jnp.int32),
        "gt_valid": jnp.ones((1, 4), bool),
        "gt_masks": jnp.asarray((rng.rand(1, 4, 16, 16) > 0.5).astype(np.uint8)),
        "sem_seg": jnp.zeros((1, 64, 64), jnp.int32),
        "rng": jax.random.PRNGKey(2),
    }
    _, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)

    # same weights, same batch, through the plain GeneralizedRCNN parent
    main_params = {k: p for k, p in v["params"].items() if k != "sem_seg_head"}
    from detectron2_centernet_tpu.models.meta_arch.rcnn import GeneralizedRCNN

    base = GeneralizedRCNN(cfg)
    _, (ld_base, _) = base.loss_fn(main_params, v.get("batch_stats", {}), batch)

    for k, v_base in ld_base.items():
        expect = float(v_base) * (1.0 if k.startswith("loss_rpn") else 0.25)
        np.testing.assert_allclose(float(ld[k]), expect, rtol=1e-6, err_msg=k)
