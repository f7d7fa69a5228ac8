"""Faster R-CNN components: sampling, RPN losses, fast-rcnn inference, e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.box_regression import Box2BoxTransform
from detectron2_centernet_tpu.models.matcher import Matcher
from detectron2_centernet_tpu.models.proposal_generator.rpn import subsample_labels
from detectron2_centernet_tpu.models.roi_heads.roi_heads import (
    fast_rcnn_inference,
    label_and_sample_proposals,
)


def _tiny_rcnn_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_subsample_labels_counts():
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray([1] * 10 + [0] * 100 + [-1] * 20, jnp.int32)
    sel = np.asarray(subsample_labels(labels, 32, 0.25, rng))
    assert (sel == 1).sum() == 8  # 32 * 0.25
    assert (sel == 0).sum() == 24
    assert (sel[labels == -1] == -1).all()

    # fewer positives than the cap: fill with negatives
    labels2 = jnp.asarray([1] * 3 + [0] * 100, jnp.int32)
    sel2 = np.asarray(subsample_labels(labels2, 32, 0.25, rng))
    assert (sel2 == 1).sum() == 3
    assert (sel2 == 0).sum() == 29


def test_label_and_sample_proposals_classes():
    rng = jax.random.PRNGKey(1)
    matcher = Matcher([0.5], [0, 1], allow_low_quality_matches=False)
    gt_boxes = jnp.asarray([[0, 0, 20, 20], [40, 40, 60, 60]], jnp.float32)
    gt_classes = jnp.asarray([2, 4], jnp.int32)
    gt_valid = jnp.ones(2, bool)
    proposals = jnp.asarray(
        [[1, 1, 19, 19], [41, 41, 61, 61], [100, 100, 120, 120]], jnp.float32
    )
    out = label_and_sample_proposals(
        proposals, jnp.ones(3, bool), gt_boxes, gt_classes, gt_valid, rng,
        matcher, num_samples=8, positive_fraction=0.5, num_classes=5,
    )
    cls = np.asarray(out["classes"])
    w = np.asarray(out["weights"])
    pos = np.asarray(out["is_pos"])
    # the two overlapping proposals + 2 appended gts are positives (capped 4)
    assert pos.sum() == 4
    assert set(cls[pos]) <= {2, 4}
    assert ((cls == 5) | pos | (w == 0)).all()  # everything else background/pad


def test_fast_rcnn_inference_picks_correct_class():
    box2box = Box2BoxTransform((10.0, 10.0, 5.0, 5.0))
    proposals = jnp.asarray([[10, 10, 30, 30], [50, 50, 80, 80]], jnp.float32)
    valid = jnp.ones(2, bool)
    # class 1 strongly predicted for roi0, class 3 for roi1
    scores = jnp.asarray(
        [[0.0, 5.0, 0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 6.0, 0.0, 0.0]]
    )
    deltas = jnp.zeros((2, 5 * 4))
    out = fast_rcnn_inference(
        proposals, valid, scores, deltas, box2box, 5, (100, 100),
        score_thresh=0.05, nms_thresh=0.5, topk_per_image=4,
    )
    s = np.asarray(out["scores"])
    c = np.asarray(out["classes"])
    live = s > 0
    top2 = c[np.argsort(-s)[:2]]
    assert set(top2) == {1, 3}


def test_rcnn_end_to_end_loss_and_predict():
    cfg = _tiny_rcnn_cfg()
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(0)
    boxes = rng.rand(2, 4, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (2, 4)), jnp.int32),
        "gt_valid": jnp.ones((2, 4), bool),
        "rng": jax.random.PRNGKey(7),
    }
    total, (ld, _) = model.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total))
    assert set(ld) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}

    dets = model.predict_fn(v, jnp.zeros((2, 64, 64, 3)))
    assert dets["boxes"].shape == (2, 100, 4)


def test_proposal_network_meta_arch():
    cfg = _tiny_rcnn_cfg()
    cfg.MODEL.META_ARCHITECTURE = "ProposalNetwork"
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    dets = model.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert dets["boxes"].shape == (1, 50, 4)  # POST_NMS_TOPK_TEST
