"""SemanticSegmentor / PanopticFPN shape + loss contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.meta_arch.panoptic_fpn import (
    combine_semantic_and_instance_outputs,
)
from detectron2_centernet_tpu.models.meta_arch.semantic_seg import sem_seg_loss
from detectron2_centernet_tpu.structures import Boxes, Instances


def _fpn_cfg():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_sem_seg_loss_ignore():
    logits = jnp.zeros((1, 4, 4, 3))
    targets = jnp.full((1, 4, 4), 255, jnp.int32)
    loss = sem_seg_loss(logits, targets)
    assert float(loss) == 0.0
    targets2 = jnp.zeros((1, 4, 4), jnp.int32)
    loss2 = sem_seg_loss(logits, targets2)
    np.testing.assert_allclose(float(loss2), np.log(3), rtol=1e-5)


def test_semantic_segmentor_shapes():
    cfg = _fpn_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    out = m.predict_fn(v, jnp.zeros((2, 64, 64, 3)))
    assert out["sem_seg"].shape == (2, 64, 64, 6)
    batch = {
        "image": jnp.zeros((2, 64, 64, 3)),
        "sem_seg": jnp.zeros((2, 64, 64), jnp.int32),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total)) and "loss_sem_seg" in ld


def test_panoptic_combine():
    inst = Instances((10, 10))
    inst.scores = np.asarray([0.9])
    inst.pred_classes = np.asarray([3])
    inst.pred_boxes = Boxes(np.asarray([[0, 0, 5, 5]], np.float32))
    masks = np.zeros((1, 10, 10), bool)
    masks[0, :5, :5] = True
    inst.pred_masks = masks
    sem = np.zeros((10, 10), np.int64)
    sem[5:, :] = 2  # stuff class with area 50
    pan, info = combine_semantic_and_instance_outputs(inst, sem, 0.5, 10, 0.5)
    assert len(info) == 2
    thing = [s for s in info if s["isthing"]][0]
    stuff = [s for s in info if not s["isthing"]][0]
    assert pan[2, 2] == thing["id"]
    assert pan[7, 7] == stuff["id"]
    assert stuff["category_id"] == 2


def test_pointrend_sem_seg_head():
    """PointRendSemSegHead (reference projects/PointRend/point_rend/
    semantic_seg.py:37-135): train adds loss_sem_seg_point; inference
    refines the SUBDIVISION_NUM_POINTS most-uncertain texels in place,
    leaving all other texels bit-identical to the coarse head."""
    cfg = _fpn_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.SEM_SEG_HEAD.NAME = "PointRendSemSegHead"
    cfg.MODEL.POINT_HEAD.NUM_CLASSES = 6
    cfg.MODEL.POINT_HEAD.TRAIN_NUM_POINTS = 32
    cfg.MODEL.POINT_HEAD.SUBDIVISION_STEPS = 1
    cfg.MODEL.POINT_HEAD.SUBDIVISION_NUM_POINTS = 64
    cfg.MODEL.POINT_HEAD.FC_DIM = 16
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    assert "point_head" in v["params"]["head"]

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    batch = {
        "image": img,
        "sem_seg": jnp.asarray(rng.randint(0, 6, (2, 64, 64)), jnp.int32),
        "rng": jax.random.PRNGKey(3),
    }
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_sem_seg_point" in ld and np.isfinite(float(total))

    out = np.asarray(m.predict_fn(v, img)["sem_seg"])
    assert out.shape == (2, 64, 64, 6)

    # coarse-only baseline: all but <= SUBDIVISION_NUM_POINTS texels match
    cfg2 = _fpn_cfg()
    cfg2.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    m2 = build_model(cfg2)
    coarse_params = dict(v["params"])
    coarse_params["head"] = coarse_params["head"]["coarse"]
    coarse = np.asarray(
        m2.predict_fn(
            {"params": coarse_params, **{k: v[k] for k in v if k != "params"}},
            img,
        )["sem_seg"]
    )
    diff = (np.abs(out - coarse).max(axis=-1) > 1e-6).sum(axis=(1, 2))
    assert (diff <= 64).all() and (diff > 0).all(), diff


def test_deeplab_resnet_trunk():
    """DeepLab trunk (reference projects/DeepLab/deeplab/resnet.py): 3x3x3
    stem, dilated res5 with multi-grid -> output stride 16."""
    import jax

    from detectron2_centernet_tpu.models.backbones.resnet import (
        build_resnet_deeplab_backbone,
    )

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 8
    cfg.MODEL.RESNETS.STEM_TYPE = "deeplab"
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.RESNETS.RES5_MULTI_GRID = [1, 2, 4]
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res5"]
    cfg.MODEL.RESNETS.NORM = "BN"
    m = build_resnet_deeplab_backbone(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    # 3-conv stem
    assert "conv3" in v["params"]["stem"]
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert out["res5"].shape[1:3] == (4, 4)  # os16, not os32
