"""Keypoint R-CNN end-to-end (KEYPOINT_ON wiring)."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.roi_heads.keypoint_head import (
    encode_keypoint_targets,
)


def test_encode_keypoint_targets_matches_numpy():
    from detectron2_centernet_tpu.structures import keypoints_to_heatmap_targets

    rng = np.random.RandomState(0)
    kp = rng.rand(5, 17, 3).astype(np.float32) * 50
    kp[..., 2] = (rng.rand(5, 17) > 0.3).astype(np.float32)
    rois = rng.rand(5, 4).astype(np.float32) * 30
    rois[:, 2:] = rois[:, :2] + 25
    idx_np, val_np = keypoints_to_heatmap_targets(kp, rois, 14)
    idx_j, val_j = encode_keypoint_targets(jnp.asarray(kp), jnp.asarray(rois), 14)
    np.testing.assert_array_equal(np.asarray(val_j), val_np)
    got = np.asarray(idx_j)
    np.testing.assert_array_equal(got[val_np > 0], idx_np[val_np > 0])


def test_keypoint_rcnn_e2e():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.KEYPOINT_ON = True
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
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 5
    cfg.MODEL.ROI_KEYPOINT_HEAD.CONV_DIMS = (16,)
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION = 7
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.DTYPE = "float32"
    m = build_model(cfg)
    # thread the CONV_DIMS through the module (sanity: head exists)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    assert any("keypoint" in k for k in v["params"])

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 3, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    kp = np.zeros((1, 3, 5, 3), np.float32)
    kp[..., 0] = boxes[..., None, 0] + 5
    kp[..., 1] = boxes[..., None, 1] + 5
    kp[..., 2] = 2
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((1, 3), jnp.int32),
        "gt_valid": jnp.ones((1, 3), bool),
        "gt_keypoints": jnp.asarray(kp),
        "rng": jax.random.PRNGKey(2),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_keypoint" in ld and np.isfinite(float(total))

    dets = m.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert dets["keypoint_heatmaps"].shape[0:2] == (1, 8)
    out = m.postprocess({k: np.asarray(x) for k, x in dets.items()}, None, [(64, 64)])
    inst = out[0]["instances"]
    if len(inst):
        assert inst.pred_keypoints.shape[1:] == (5, 3)
