"""TensorMask project e2e on synthetic data (tiny shapes, CPU).

Covers: config merge against the reference project's own YAML structure,
one train step with finite cls/box/mask losses, the vectorized assignment
rule semantics, and fixed-K inference producing pasted masks.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "TensorMask")
)

from tensormask_tpu import add_tensormask_config  # noqa: E402
from detectron2_centernet_tpu.config import get_cfg  # noqa: E402
from detectron2_centernet_tpu.models import build_model  # noqa: E402


def _cfg(mask_on=True, bipyramid=True):
    cfg = get_cfg()
    add_tensormask_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "TensorMask"
    cfg.MODEL.MASK_ON = mask_on
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p2", "p3", "p4"]
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 5
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 1
    cfg.MODEL.TENSOR_MASK.CLS_CHANNELS = 16
    cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS = 16
    cfg.MODEL.TENSOR_MASK.MASK_CHANNELS = 16
    cfg.MODEL.TENSOR_MASK.ALIGNED_ON = True
    cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON = bipyramid
    cfg.MODEL.TENSOR_MASK.MAX_MASKS_PER_LEVEL = 4
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16, 24], [32, 48], [64, 96]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    return cfg


def _batch(n=2, m=6, raster=16):
    rng = np.random.RandomState(0)
    boxes = rng.rand(n, m, 4).astype(np.float32) * 20
    boxes[..., 2:] = boxes[..., :2] + 6 + boxes[..., 2:] * 0.5
    boxes = np.clip(boxes, 0, 63)
    return {
        "image": jnp.asarray(rng.rand(n, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (n, m)), jnp.int32),
        "gt_valid": jnp.ones((n, m), bool),
        "gt_masks": jnp.asarray(
            rng.rand(n, m, raster, raster) > 0.4, jnp.float32
        ),
    }


def test_config_merges_reference_yaml():
    cfg = get_cfg()
    add_tensormask_config(cfg)
    here = os.path.join(
        os.path.dirname(__file__), "..", "..", "projects", "TensorMask", "configs"
    )
    for name in os.listdir(here):
        c = cfg.clone()
        c.merge_from_file(os.path.join(here, name))
    assert cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA == 3.0


def test_train_step_losses_finite():
    cfg = _cfg()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    batch = _batch()
    total, (ld, _) = jax.jit(model.loss_fn)(
        variables["params"], variables.get("batch_stats", {}), batch
    )
    assert set(ld) == {"loss_cls", "loss_box_reg", "loss_mask"}
    for k, v in ld.items():
        assert np.isfinite(float(v)), (k, ld)
    g = jax.grad(
        lambda p: model.loss_fn(p, variables.get("batch_stats", {}), batch)[0]
    )(variables["params"])
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_assignment_rule_semantics():
    """An anchor that contains a centered gt of matching scale is fg; a
    distant or non-containing anchor is not."""
    cfg = _cfg(mask_on=False)
    model = build_model(cfg)
    anchors = jnp.asarray(
        [[0.0, 0.0, 32.0, 32.0], [40.0, 40.0, 56.0, 56.0]], jnp.float32
    )
    units = jnp.asarray([4.0, 4.0])
    gt = jnp.asarray([[6.0, 6.0, 26.0, 26.0]], jnp.float32)
    matches, fg = model.assign(
        gt, jnp.asarray([1], jnp.int32), jnp.asarray([True]), anchors, units
    )
    assert bool(fg[0]) is True  # contained, centered, right scale
    assert bool(fg[1]) is False  # does not contain the gt


def test_inference_shapes_and_postprocess():
    cfg = _cfg()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    imgs = jnp.asarray(
        np.random.RandomState(1).rand(2, 64, 64, 3) * 255, jnp.float32
    )
    dets = jax.jit(model.predict_fn)(variables, imgs)
    assert dets["boxes"].shape == (2, 8, 4)
    assert dets["prov"].shape == (2, 8, 3)
    res = model.postprocess(
        {k: np.asarray(v) for k, v in dets.items()}, None, [(64, 64), (80, 60)]
    )
    assert len(res) == 2
    inst = res[0]["instances"]
    if len(inst) and model.mask_on:
        assert inst.pred_masks.shape[1:] == (64, 64)
