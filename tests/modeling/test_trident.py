"""TridentNet: weight sharing across branches + folded-batch training."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.backbones.trident import TridentResNet


def test_trident_backbone_branch_folding_and_sharing():
    t = TridentResNet(depth=50, res2_out_channels=32, stem_out_channels=16,
                      width_per_group=8)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    v = t.init(jax.random.PRNGKey(0), x, False)
    # eval: single (middle) branch
    out_eval = t.apply(v, x, False)["res4"]
    assert out_eval.shape[0] == 2
    # train: 3 branches folded into batch
    out_train = t.apply(v, x, True)["res4"]
    assert out_train.shape[0] == 6
    # weight sharing: res4 has ONE conv2 kernel per block (no per-branch copies)
    res4_params = [k for k in v["params"] if k.startswith("res4_block")]
    for k in res4_params:
        assert "conv2_kernel" in v["params"][k]
    # middle branch of the folded output == eval output (same dilation 2)
    np.testing.assert_allclose(
        np.asarray(out_train[2:4]), np.asarray(out_eval), atol=1e-5
    )


def test_trident_rcnn_e2e():
    cfg = get_cfg()
    cfg.merge_from_file("configs/Misc/trident_fast_R_50_C4_1x.yaml")
    cfg.DATASETS.TRAIN = ()
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 60
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 30
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 40
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.DTYPE = "float32"
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    dets = m.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert dets["boxes"].shape == (1, 8, 4)

    rng = np.random.RandomState(0)
    boxes = rng.rand(1, 3, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 3)), jnp.int32),
        "gt_valid": jnp.ones((1, 3), bool),
        "rng": jax.random.PRNGKey(5),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total))


def test_trident_full_test_branch_merge():
    """TEST_BRANCH_IDX=-1: all branches run on a tiled batch and merge via
    class-aware NMS (reference merge_branch_instances, trident_rcnn.py:8-44).
    The merged set must contain the single-branch (Fast) top detection:
    NMS over the union can only add cross-branch boxes, not lose the
    middle branch's best one (it suppresses only lower-scored overlaps)."""
    cfg = get_cfg()
    cfg.merge_from_file("configs/Misc/trident_fast_R_50_C4_1x.yaml")
    cfg.DATASETS.TRAIN = ()
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 40
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.DTYPE = "float32"

    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)

    m_fast = build_model(cfg)
    v = m_fast.init(jax.random.PRNGKey(0), (64, 64))
    fast = m_fast.predict_fn(v, img)

    cfg.MODEL.TRIDENT.TEST_BRANCH_IDX = -1
    m_full = build_model(cfg)
    full = m_full.predict_fn(v, img)  # same params: backbone is weight-shared

    assert full["boxes"].shape == fast["boxes"].shape == (2, 8, 4)
    # the Fast branch's best box survives branch merging for each image
    for i in range(2):
        fb = np.asarray(fast["boxes"][i][np.argmax(np.asarray(fast["scores"][i]))])
        dists = np.abs(np.asarray(full["boxes"][i]) - fb).max(axis=1)
        assert dists.min() < 1e-3, (fb, np.asarray(full["boxes"][i]))
