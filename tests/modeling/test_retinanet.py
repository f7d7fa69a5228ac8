"""RetinaNet meta-arch: shapes, losses, matcher/box-transform round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.anchors import DefaultAnchorGenerator
from detectron2_centernet_tpu.models.box_regression import Box2BoxTransform
from detectron2_centernet_tpu.models.matcher import Matcher
from detectron2_centernet_tpu.ops.nms import batched_nms_fixed, nms_fixed, pairwise_iou_xyxy


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RETINANET.NUM_CLASSES = 5
    cfg.MODEL.RETINANET.NUM_CONVS = 1
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_anchor_generator_counts_and_centers():
    gen = DefaultAnchorGenerator(
        sizes=[[32.0]], aspect_ratios=[[1.0]], strides=[8, 16], offset=0.5
    )
    anchors = gen.grid_anchors([(2, 2), (1, 1)])
    assert anchors[0].shape == (4, 4)
    assert anchors[1].shape == (1, 4)
    # first anchor of level 0: centered at (0.5*8, 0.5*8) with size 32
    np.testing.assert_allclose(anchors[0][0], [4 - 16, 4 - 16, 4 + 16, 4 + 16])


def test_box2box_round_trip():
    t = Box2BoxTransform((10.0, 10.0, 5.0, 5.0))
    src = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 20.0, 30.0]])
    dst = jnp.asarray([[1.0, 2.0, 12.0, 13.0], [4.0, 3.0, 22.0, 26.0]])
    deltas = t.get_deltas(src, dst)
    rec = t.apply_deltas(deltas, src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(dst), atol=1e-4)


def test_matcher_thresholds_and_rescue():
    m = Matcher([0.4, 0.5], [0, -1, 1], allow_low_quality_matches=True)
    # 2 gts x 4 anchors
    iou = jnp.asarray(
        [[0.9, 0.45, 0.1, 0.0],
         [0.0, 0.0, 0.3, 0.35]]
    )
    matches, labels = m(iou, jnp.asarray([True, True]))
    labels = np.asarray(labels)
    assert labels[0] == 1      # 0.9 -> positive
    assert labels[1] == -1     # 0.45 -> ignore band
    assert labels[3] == 1      # 0.35 < 0.4 but best for gt1 -> rescued
    assert labels[2] == 0      # 0.3 -> negative
    # invalid gts -> all background
    _, labels2 = m(iou, jnp.asarray([False, False]))
    assert (np.asarray(labels2) == 0).all()


def test_nms_fixed_suppresses():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [100, 100, 110, 110]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, -jnp.inf])
    keep, valid = nms_fixed(boxes, scores, 0.5, max_out=4)
    keep, valid = np.asarray(keep), np.asarray(valid)
    assert valid.sum() == 2  # box1 suppressed by box0; box3 invalid
    assert keep[0] == 0 and keep[1] == 2
    # class-aware: same boxes different classes are NOT suppressed
    classes = jnp.asarray([0, 1, 0, 0])
    keep2, valid2 = batched_nms_fixed(boxes, scores, classes, 0.5, max_out=4)
    assert np.asarray(valid2).sum() == 3


def test_retinanet_loss_perfect_prediction_is_small():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(0)
    boxes = np.asarray([[[8.0, 8.0, 40.0, 40.0]]], np.float32)
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    total, (ld, _) = model.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total))
    assert float(ld["loss_cls"]) > 0 and float(ld["loss_box_reg"]) > 0


def test_retinanet_ema_loss_normalizer():
    """LOSS_NORMALIZER=ema reproduces the reference's momentum-0.9 running
    fg count (retinanet.py:91-92,216-218), threaded through batch_stats."""
    cfg = _tiny_cfg()
    cfg.MODEL.RETINANET.LOSS_NORMALIZER = "ema"
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]], np.float32),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    stats = v.get("batch_stats", {})
    total1, (ld1, stats1) = model.loss_fn(v["params"], stats, batch)
    norm1 = float(stats1["loss_normalizer"])
    # in-batch fg count for this scene
    cfg2 = _tiny_cfg()
    model_b = build_model(cfg2)
    _, (ld_b, stats_b) = model_b.loss_fn(v["params"], stats, batch)
    assert "loss_normalizer" not in stats_b
    num_pos = float(ld1["loss_cls"]) / float(ld_b["loss_cls"]) * norm1
    # step 1: norm = 0.9*100 + 0.1*num_pos
    np.testing.assert_allclose(norm1, 0.9 * 100.0 + 0.1 * num_pos, rtol=1e-5)
    # step 2 feeds the updated normalizer back through batch_stats
    _, (_, stats2) = model.loss_fn(v["params"], stats1, batch)
    np.testing.assert_allclose(
        float(stats2["loss_normalizer"]), 0.9 * norm1 + 0.1 * num_pos, rtol=1e-5
    )


def test_retinanet_predict_shapes():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    dets = model.predict_fn(v, jnp.zeros((2, 64, 64, 3)))
    assert dets["boxes"].shape == (2, 100, 4)
    assert dets["scores"].shape == (2, 100)
    assert dets["classes"].shape == (2, 100)
