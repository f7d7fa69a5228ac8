"""Whole-model golden parity: complete reference torch models vs ours.

Round-3 VERDICT item 1: module-level goldens (test_module_parity.py) stop
short of full models; these tests run the reference's COMPLETE meta-archs
on CPU torch — CenterNet ResNet-18 ctdet (centernet.py:268-320, no DCN),
RetinaNet R50-FPN forward + inference (retinanet.py:323-489) and
FastRCNNOutputs losses/inference (fast_rcnn.py:46-572) — transfer the
weights through ``checkpoint.torch_import``, and compare head maps, losses
and decoded detections against our jitted implementations.  This is the
strongest mAP-parity proxy available without mounted checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg

from .conftest import from_nhwc, seed_torch_module, to_nhwc
from .test_module_parity import _transfer

MAP_ATOL = 5e-4  # full-depth conv stacks accumulate ~2e-4 of f32 noise
BOX_ATOL = 2e-3  # boxes additionally scale by down_ratio=4


NUM_CLASSES = 5
THING_CLASSES = [f"c{i}" for i in range(NUM_CLASSES)]


def _ctdet_cfg():
    """One cfg both sides understand (our CfgNode is yacs-duck-typed)."""
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RESNETS.NORM = "FrozenBN"
    cfg.MODEL.PIXEL_MEAN = [0.408, 0.447, 0.470]
    cfg.MODEL.PIXEL_STD = [0.289, 0.274, 0.278]
    cfg.MODEL.CENTERNET.TASK.HM = NUM_CLASSES
    cfg.MODEL.CENTERNET.DOWN_RATIO = 4
    cfg.MODEL.CENTERNET.SIZE_DIVISIBILITY = 16
    cfg.DATASETS.TRAIN = ("parity_ctdet",)
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="module")
def ctdet_pair(ref_full):
    """(reference torch CenterNet R18, our CenterNet, our variables)."""
    torch = ref_full.torch
    if "parity_ctdet" not in ref_full.catalog.DatasetCatalog:
        ref_full.catalog.DatasetCatalog.register("parity_ctdet", lambda: [{}])
        ref_full.catalog.MetadataCatalog.get("parity_ctdet").thing_classes = (
            THING_CLASSES
        )

    cfg = _ctdet_cfg()
    t = ref_full.centernet.CenterNet(cfg.clone())
    seed_torch_module(t)
    # seeding fills every buffer — restore the normalization constants
    with torch.no_grad():
        t.pixel_mean.copy_(
            torch.tensor(cfg.MODEL.PIXEL_MEAN).view(-1, 1, 1)
        )
        t.pixel_std.copy_(torch.tensor(cfg.MODEL.PIXEL_STD).view(-1, 1, 1))
        # bias wh positive so random-weight decode yields non-degenerate
        # boxes (otherwise detector_postprocess's nonempty filter empties
        # the comparison)
        t.wh[-1].bias.add_(4.0)
    t.eval()

    from detectron2_centernet_tpu.data.catalog import (
        DatasetCatalog as OurDC,
        MetadataCatalog as OurMC,
    )

    if "parity_ctdet" not in OurDC:
        OurDC.register("parity_ctdet", lambda: [{}])
        OurMC.get("parity_ctdet").thing_classes = THING_CLASSES

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    assert ours.num_classes == NUM_CLASSES
    variables = ours.init(jax.random.PRNGKey(0), (64, 64))
    variables = _transfer(t, variables)
    return t, ours, variables


def test_ctdet_r18_head_map_parity(ctdet_pair, ref_full):
    """hm/wh/reg maps of the full model (stem->res4->2 deconvs->3 heads)."""
    torch = ref_full.torch
    t, ours, variables = ctdet_pair
    g = torch.Generator().manual_seed(11)
    img = torch.rand(3, 64, 96, generator=g) * 255  # CHW, raw pixels

    with torch.no_grad():
        images, _ = t.preprocess_image([{"image": img}])
        y = t.backbone(images.tensor)
        y = t.deconv_layers(y["res4"])
        z_ref = {h.lower(): getattr(t, h.lower())(y) for h in t.heads}

    xj = jnp.asarray(to_nhwc(img.unsqueeze(0)))
    z = ours.module.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        ours.normalize(xj),
        train=False,
    )
    for head in ("hm", "wh", "reg"):
        np.testing.assert_allclose(
            np.asarray(z[head]),
            to_nhwc(z_ref[head]),
            atol=MAP_ATOL,
            err_msg=f"head {head}",
        )


def test_ctdet_r18_decoded_detections_parity(ctdet_pair, ref_full):
    """End-to-end eval forward: reference model(batched_inputs) Instances
    vs our predict_fn + postprocess — boxes/scores/classes must agree."""
    torch = ref_full.torch
    t, ours, variables = ctdet_pair
    g = torch.Generator().manual_seed(12)
    h, w = 64, 96
    img = torch.rand(3, h, w, generator=g) * 255

    with torch.no_grad():
        out = t([{"image": img, "height": h, "width": w}])
    inst_ref = out[0]["instances"]
    ref_boxes = inst_ref.pred_boxes.tensor.numpy()
    ref_scores = inst_ref.scores.numpy()
    ref_classes = inst_ref.pred_classes.numpy()

    xj = jnp.asarray(to_nhwc(img.unsqueeze(0)))
    dets = ours.predict_fn(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        xj,
    )
    results = ours.postprocess(
        {k: np.asarray(v) for k, v in dets.items()}, None, [(h, w)]
    )
    inst = results[0]["instances"]

    assert len(inst_ref) > 10, "degenerate scene: nothing survived"
    assert len(inst) == len(inst_ref), (len(inst), len(inst_ref))
    np.testing.assert_allclose(inst.scores, ref_scores, atol=MAP_ATOL)
    np.testing.assert_array_equal(inst.pred_classes, ref_classes)
    np.testing.assert_allclose(
        np.asarray(inst.pred_boxes.tensor).reshape(-1, 4),
        ref_boxes.reshape(-1, 4),
        atol=BOX_ATOL,
    )


def _retinanet_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RETINANET.NUM_CLASSES = 6
    cfg.MODEL.RETINANET.LOSS_NORMALIZER = "ema"  # reference semantics
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True  # reference pads by divisibility only
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="module")
def retinanet_pair(ref_full):
    torch = ref_full.torch
    cfg = _retinanet_cfg()
    t = ref_full.retinanet.RetinaNet(cfg.clone())
    # anchors/pixel stats are buffers too — preserve through seeding
    saved = {
        k: v.clone()
        for k, v in t.state_dict().items()
        if "anchor" in k or "pixel" in k
    }
    seed_torch_module(t)
    with torch.no_grad():
        for k, v in saved.items():
            dict(t.named_buffers())[k].copy_(v)
        # seeded R50 amplifies activations to ~1e3 at the head inputs;
        # rescale the predictors so logits/deltas land in a regime with
        # diverse scores and mostly-valid boxes (no score ties, no
        # all-degenerate scenes)
        t.head.cls_score.weight.mul_(1e-3)
        t.head.bbox_pred.weight.mul_(1e-3)
        t.head.bbox_pred.bias.mul_(0.0)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (128, 128))
    variables = _transfer(t, variables)
    return t, ours, variables


def test_retinanet_r50_loss_parity(retinanet_pair, ref_full):
    """Full-model training losses: anchors + matching + focal/smooth-L1 +
    EMA normalizer (reference retinanet.py:133-234)."""
    torch = ref_full.torch
    t, ours, variables = retinanet_pair
    Instances = ref_full.centernet.Instances
    Boxes = ref_full.centernet.Boxes

    g = torch.Generator().manual_seed(21)
    h = w = 128
    img = torch.rand(3, h, w, generator=g) * 255
    boxes = torch.tensor([[8.0, 10.0, 60.0, 70.0], [70.0, 30.0, 120.0, 110.0]])
    classes = torch.tensor([1, 4])
    inst = Instances((h, w))
    inst.gt_boxes = Boxes(boxes)
    inst.gt_classes = classes

    t.train()
    with torch.no_grad(), ref_full.events.EventStorage():
        losses_ref = t([{"image": img, "instances": inst}])
    t.eval()

    max_objs = 8
    gt_boxes = np.zeros((1, max_objs, 4), np.float32)
    gt_classes = np.zeros((1, max_objs), np.int32)
    gt_valid = np.zeros((1, max_objs), bool)
    gt_boxes[0, :2] = boxes.numpy()
    gt_classes[0, :2] = classes.numpy()
    gt_valid[0, :2] = True
    batch = {
        "image": jnp.asarray(to_nhwc(img.unsqueeze(0))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }
    _, (loss_dict, new_stats) = ours.loss_fn(
        variables["params"], variables.get("batch_stats", {}), batch
    )
    np.testing.assert_allclose(
        float(loss_dict["loss_cls"]), float(losses_ref["loss_cls"]), rtol=5e-4
    )
    np.testing.assert_allclose(
        float(loss_dict["loss_box_reg"]),
        float(losses_ref["loss_box_reg"]),
        rtol=5e-4,
    )
    # EMA normalizer advanced identically
    np.testing.assert_allclose(
        float(new_stats["loss_normalizer"]), t.loss_normalizer, rtol=1e-6
    )


def test_retinanet_r50_inference_parity(retinanet_pair, ref_full):
    """Full eval forward: per-level top-k + threshold + class-aware NMS +
    detector_postprocess (reference retinanet.py:323-404) vs our
    predict_fn/postprocess."""
    torch = ref_full.torch
    t, ours, variables = retinanet_pair
    g = torch.Generator().manual_seed(22)
    h = w = 128
    img = torch.rand(3, h, w, generator=g) * 255

    with torch.no_grad():
        out = t([{"image": img, "height": h, "width": w}])
    inst_ref = out[0]["instances"]

    dets = ours.predict_fn(variables, jnp.asarray(to_nhwc(img.unsqueeze(0))))
    results = ours.postprocess(
        {k: np.asarray(v) for k, v in dets.items()}, None, [(h, w)]
    )
    inst = results[0]["instances"]

    assert len(inst_ref) > 5, "degenerate scene"
    assert len(inst) == len(inst_ref), (len(inst), len(inst_ref))
    order = np.argsort(-inst.scores)
    order_ref = np.argsort(-inst_ref.scores.numpy())
    np.testing.assert_allclose(
        inst.scores[order], inst_ref.scores.numpy()[order_ref], atol=MAP_ATOL
    )
    np.testing.assert_array_equal(
        inst.pred_classes[order], inst_ref.pred_classes.numpy()[order_ref]
    )
    np.testing.assert_allclose(
        np.asarray(inst.pred_boxes.tensor)[order],
        inst_ref.pred_boxes.tensor.numpy()[order_ref],
        atol=BOX_ATOL,
    )


def test_fast_rcnn_outputs_loss_parity(ref_full):
    """FastRCNNOutputs losses on fixed, no-sampling inputs
    (reference fast_rcnn.py:131-313): softmax CE over all rois + fg
    smooth-L1 normalized by the total roi count."""
    torch = ref_full.torch
    from detectron2_centernet_tpu.models.box_regression import (
        Box2BoxTransform as OurB2B,
    )
    from detectron2_centernet_tpu.models.roi_heads.roi_heads import (
        fast_rcnn_losses,
    )

    C, R = 4, 24
    g = torch.Generator().manual_seed(31)
    logits = torch.randn(R, C + 1, generator=g)
    deltas = torch.randn(R, 4 * C, generator=g) * 0.3
    props = torch.rand(R, 4, generator=g) * 40
    props = torch.cat([props[:, :2], props[:, :2] + 10 + props[:, 2:]], dim=1)
    gt_boxes = props + torch.randn(R, 4, generator=g) * 2
    gt_classes = torch.tensor([i % (C + 1) for i in range(R)])  # C = background

    Instances = ref_full.centernet.Instances
    Boxes = ref_full.centernet.Boxes
    inst = Instances((64, 64))
    inst.proposal_boxes = Boxes(props)
    inst.gt_boxes = Boxes(gt_boxes)
    inst.gt_classes = gt_classes
    b2b_ref = ref_full.box_regression.Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    with ref_full.events.EventStorage():
        out = ref_full.fast_rcnn.FastRCNNOutputs(
            b2b_ref, logits, deltas, [inst], smooth_l1_beta=0.5
        )
        losses_ref = out.losses()

    sampled = {
        "classes": jnp.asarray(gt_classes.numpy(), jnp.int32),
        "weights": jnp.ones((R,), jnp.float32),
        "boxes": jnp.asarray(props.numpy()),
        "target_boxes": jnp.asarray(gt_boxes.numpy()),
        "is_pos": jnp.asarray(gt_classes.numpy() < C),
        "matched_idx": jnp.zeros((R,), jnp.int32),
    }
    ours = fast_rcnn_losses(
        jnp.asarray(logits.numpy()),
        jnp.asarray(deltas.numpy()),
        sampled,
        OurB2B((10.0, 10.0, 5.0, 5.0)),
        C,
        smooth_l1_beta=0.5,
    )
    np.testing.assert_allclose(
        float(ours["loss_cls"]), float(losses_ref["loss_cls"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ours["loss_box_reg"]), float(losses_ref["loss_box_reg"]), rtol=1e-5
    )


def test_fast_rcnn_inference_parity(ref_full):
    """fast_rcnn_inference: per-class decode + threshold + per-class NMS +
    top-k (reference fast_rcnn.py:46-128) vs our fixed-slot version."""
    torch = ref_full.torch
    from detectron2_centernet_tpu.models.box_regression import (
        Box2BoxTransform as OurB2B,
    )
    from detectron2_centernet_tpu.models.roi_heads.roi_heads import (
        fast_rcnn_inference,
    )

    C, R = 4, 32
    g = torch.Generator().manual_seed(32)
    logits = torch.randn(R, C + 1, generator=g)
    deltas = torch.randn(R, 4 * C, generator=g) * 0.2
    props = torch.rand(R, 4, generator=g) * 40
    props = torch.cat([props[:, :2], props[:, :2] + 10 + props[:, 2:]], dim=1)

    b2b_ref = ref_full.box_regression.Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))
    pred_boxes = b2b_ref.apply_deltas(deltas, props)  # (R, 4C)
    probs = torch.softmax(logits, dim=-1)
    inst_ref, _ = ref_full.fast_rcnn.fast_rcnn_inference_single_image(
        pred_boxes, probs, (64, 64), 0.05, 0.5, 20
    )

    dets = fast_rcnn_inference(
        jnp.asarray(props.numpy()),
        jnp.ones((R,), bool),
        jnp.asarray(logits.numpy()),
        jnp.asarray(deltas.numpy()),
        OurB2B((10.0, 10.0, 5.0, 5.0)),
        C,
        (64, 64),
        score_thresh=0.05,
        nms_thresh=0.5,
        topk_per_image=20,
    )
    scores = np.asarray(dets["scores"])
    keep = scores > 0.05
    assert len(inst_ref) > 5, "degenerate scene"
    assert keep.sum() == len(inst_ref)
    np.testing.assert_allclose(
        scores[keep], inst_ref.scores.numpy(), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(dets["classes"])[keep], inst_ref.pred_classes.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(dets["boxes"])[keep],
        inst_ref.pred_boxes.tensor.numpy(),
        atol=1e-4,
    )


def test_ctdet_r18_loss_parity(ctdet_pair, ref_full):
    """Training losses: reference gen_heatmap targets + FocalLoss/RegL1Loss
    vs our target_gen + focal/reg_l1 on identical inputs."""
    torch = ref_full.torch
    t, ours, variables = ctdet_pair
    Instances = ref_full.centernet.Instances
    Boxes = ref_full.centernet.Boxes

    g = torch.Generator().manual_seed(13)
    h, w = 64, 96
    img = torch.rand(3, h, w, generator=g) * 255
    boxes = torch.tensor(
        [[4.0, 6.0, 40.0, 50.0], [50.0, 10.0, 90.0, 60.0], [20.0, 20.0, 36.0, 30.0]]
    )
    classes = torch.tensor([0, 2, 4])
    inst = Instances((h, w))
    inst.gt_boxes = Boxes(boxes)
    inst.gt_classes = classes

    t.train()
    with torch.no_grad():
        losses_ref = t([{"image": img, "instances": inst, "height": h, "width": w}])
    t.eval()

    # our side: loss_fn generates targets internally from the gt arrays
    max_objs = 128
    gt_boxes = np.zeros((1, max_objs, 4), np.float32)
    gt_classes = np.zeros((1, max_objs), np.int32)
    gt_valid = np.zeros((1, max_objs), bool)
    gt_boxes[0, :3] = boxes.numpy()
    gt_classes[0, :3] = classes.numpy()
    gt_valid[0, :3] = True
    batch = {
        "image": jnp.asarray(to_nhwc(img.unsqueeze(0))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }
    _, (loss_dict, _) = ours.loss_fn(
        variables["params"], variables["batch_stats"], batch
    )
    np.testing.assert_allclose(
        float(loss_dict["hm_loss"]), float(losses_ref["hm_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(loss_dict["wh_loss"]), float(losses_ref["wh_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(loss_dict["off_loss"]), float(losses_ref["off_loss"]), rtol=2e-4
    )
