"""Whole-model Rotated Faster R-CNN golden parity (round-4 VERDICT item 7).

The reference's complete rotated two-stage pipeline — GeneralizedRCNN with
RRPN (proposal_generator/rrpn.py:113-235) and RROIHeads
(roi_heads/rotated_fast_rcnn.py:168-262): backbone -> rotated anchors ->
RRPN losses / find_top_rrpn_proposals (clip + nonempty + per-level rotated
NMS) -> rotated IoU matching / sampling -> box head ->
RotatedFastRCNNOutputLayers -> per-class rotated NMS — runs on CPU torch
(through the conftest's exact host rotated kernels), its weights transfer
through the production aligner, and train-mode loss dicts plus eval-mode
detections are compared against our jitted ``RotatedRCNN``.

Randomized subsampling is neutralized with the keep-everything trick (see
test_maskrcnn_whole_model.py).  The rotated ``_C`` kernels the reference
calls are realized in the conftest as exact host implementations (see
``ref_rotated``) — so this golden checks everything BETWEEN the kernels:
anchor layout, Box2BoxTransformRotated plumbing, the clip-before-NMS
semantics, matching/sampling sets, loss normalization, and the inference
candidate-grid + per-class-NMS path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg

from .conftest import seed_torch_module, to_nhwc
from .test_module_parity import _transfer

NUM_CLASSES = 5
MAX_GT = 8
POST_NMS_TRAIN = 64
IMG = 128


def _rotated_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RotatedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    cfg.MODEL.ANCHOR_GENERATOR.NAME = "RotatedAnchorGenerator"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    # non-square anchors: square anchors at angles 90° apart are the SAME
    # polygon, an exact IoU tie the reference keeps as two low-quality
    # positives but f32 jax trig breaks (test artifact, not semantics)
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[2.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-30, 0, 60]]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.RPN.BBOX_REG_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)
    # keep-everything sampling (384 anchors at IMG=128 / stride 16)
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 65536
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS_TRAIN + MAX_GT
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = POST_NMS_TRAIN
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 256
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignRotated"
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0, 1.0)
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True
    cfg.MODEL.CENTERNET.MAX_OBJS = MAX_GT
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="module")
def rotated_pair(ref_rotated):
    torch = ref_rotated.torch
    cfg = _rotated_cfg()
    t = ref_rotated.rcnn.GeneralizedRCNN(cfg.clone())
    saved = {
        k: v.clone()
        for k, v in t.named_buffers()
        if "anchor" in k or "pixel" in k
    }
    seed_torch_module(t)
    with torch.no_grad():
        for k, v in saved.items():
            dict(t.named_buffers())[k].copy_(v)
        # damp the predictors so logits/deltas land in a sane, tie-free
        # regime (same recipe as the Mask R-CNN golden)
        t.proposal_generator.rpn_head.objectness_logits.weight.mul_(1e-3)
        t.proposal_generator.rpn_head.anchor_deltas.weight.mul_(1e-4)
        t.proposal_generator.rpn_head.anchor_deltas.bias.mul_(0.0)
        t.roi_heads.box_predictor.cls_score.weight.mul_(1e-3)
        t.roi_heads.box_predictor.cls_score.bias.mul_(0.0)
        t.roi_heads.box_predictor.bbox_pred.weight.mul_(1e-4)
        t.roi_heads.box_predictor.bbox_pred.bias.mul_(0.0)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (IMG, IMG))
    variables = _transfer(t, variables)
    return t, ours, variables


def _scene(torch):
    g = torch.Generator().manual_seed(47)
    img = torch.rand(3, IMG, IMG, generator=g) * 255
    # (cx, cy, w, h, angle_deg) — angles away from the 1-degree clip band;
    # centers off the anchor half-lattice so no gt has an exact multi-anchor
    # IoU tie (the matcher's low-quality step keeps exact ties, and exact
    # float ties under symmetric geometry are broken differently by f32 jax
    # vs f64 host arithmetic — a test artifact, not a semantics difference)
    boxes = torch.tensor(
        [[41.3, 44.9, 48.0, 28.0, 20.0], [86.2, 70.7, 56.0, 40.0, -40.0]]
    )
    classes = torch.tensor([1, 3])
    return img, boxes, classes


def test_rotated_rcnn_loss_parity(rotated_pair, ref_rotated):
    torch = ref_rotated.torch
    t, ours, variables = rotated_pair
    Instances = ref_rotated.centernet.Instances
    RotatedBoxes = ref_rotated.rotated_fast_rcnn.RotatedBoxes

    img, boxes, classes = _scene(torch)
    inst = Instances((IMG, IMG))
    inst.gt_boxes = RotatedBoxes(boxes)
    inst.gt_classes = classes

    t.train()
    with torch.no_grad(), ref_rotated.events.EventStorage():
        losses_ref = t([{"image": img, "instances": inst}])
    t.eval()

    gt_boxes = np.zeros((1, MAX_GT, 5), np.float32)
    gt_classes = np.zeros((1, MAX_GT), np.int32)
    gt_valid = np.zeros((1, MAX_GT), bool)
    gt_boxes[0, :2] = boxes.numpy()
    gt_classes[0, :2] = classes.numpy()
    gt_valid[0, :2] = True
    batch = {
        "image": jnp.asarray(to_nhwc(img.unsqueeze(0))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }
    _, (loss_dict, _) = ours.loss_fn(
        variables["params"], variables.get("batch_stats", {}), batch
    )

    for k, rtol in (
        ("loss_rpn_cls", 5e-4),
        ("loss_rpn_loc", 5e-4),
        ("loss_cls", 5e-4),
        ("loss_box_reg", 2e-3),
    ):
        np.testing.assert_allclose(
            float(loss_dict[k]), float(losses_ref[k]), rtol=rtol, err_msg=k
        )


def test_rotated_rcnn_inference_parity(rotated_pair, ref_rotated):
    """Eval forward without postprocess: rotated boxes/scores/classes after
    the full pipeline (RRPN proposals -> ROIAlignRotated -> per-class
    rotated NMS)."""
    torch = ref_rotated.torch
    t, ours, variables = rotated_pair
    img, _, _ = _scene(torch)

    with torch.no_grad():
        out = t.inference([{"image": img}], do_postprocess=False)
    inst_ref = out[0]
    ref_scores = inst_ref.scores.numpy()
    ref_boxes = inst_ref.pred_boxes.tensor.numpy()
    ref_classes = inst_ref.pred_classes.numpy()

    dets = ours.predict_fn(variables, jnp.asarray(to_nhwc(img.unsqueeze(0))))
    scores = np.asarray(dets["scores"])[0]
    keep = scores > ours.score_threshold
    scores = scores[keep]
    boxes = np.asarray(dets["boxes"])[0][keep]
    classes = np.asarray(dets["classes"])[0][keep]

    assert len(inst_ref) > 3, "degenerate scene"
    assert len(scores) == len(inst_ref), (len(scores), len(inst_ref))
    order = np.argsort(-scores)
    order_ref = np.argsort(-ref_scores)
    np.testing.assert_allclose(scores[order], ref_scores[order_ref], atol=1e-4)
    np.testing.assert_array_equal(classes[order], ref_classes[order_ref])
    np.testing.assert_allclose(boxes[order], ref_boxes[order_ref], atol=5e-3)
