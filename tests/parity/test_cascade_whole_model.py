"""Whole-model Cascade R-CNN R50-FPN golden parity.

The reference's full cascade pipeline — GeneralizedRCNN with CascadeROIHeads
(cascade_rcnn.py:31-295): backbone -> RPN -> stage-0 label-and-sample ->
3x [box head -> class-agnostic refine -> clip -> re-match at rising IoU] ->
stage-loss sum (train) / mean-of-stage-probs + last-stage boxes (eval) —
runs on CPU torch through the conftest stubs, weights transfer through the
production aligner, and train-mode loss dicts plus eval-mode detections are
compared against our jitted implementation.  Cascade-specific semantics
covered: inter-stage box clipping (_create_proposals_from_boxes:278-295),
the nonempty filter (weight-0 equivalent here), per-stage matchers with no
re-sampling, per-stage Box2BoxTransform weights, and score averaging.

Same keep-everything sampling trick as test_maskrcnn_whole_model.py to
neutralize the unseeded torch subsampling RNG.
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


@pytest.fixture(scope="session")
def ref_cascade(ref_rcnn):
    import importlib

    ns = ref_rcnn
    ns.cascade_rcnn = importlib.import_module(
        "detectron2.modeling.roi_heads.cascade_rcnn"
    )  # registers CascadeROIHeads
    return ns


def _cascade_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True  # reference asserts
    # keep-everything sampling (see test_maskrcnn_whole_model.py docstring)
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 65536
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS_TRAIN + MAX_GT
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = POST_NMS_TRAIN
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 128
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True
    cfg.MODEL.CENTERNET.MAX_OBJS = MAX_GT
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="session")
def cascade_pair(ref_cascade):
    torch = ref_cascade.torch
    cfg = _cascade_cfg()
    t = ref_cascade.rcnn.GeneralizedRCNN(cfg.clone())
    saved = {
        k: v.clone()
        for k, v in t.named_buffers()
        if "anchor" in k or "pixel" in k
    }
    seed_torch_module(t)
    with torch.no_grad():
        for k, v in saved.items():
            dict(t.named_buffers())[k].copy_(v)
        # tame the seeded-R50 activation scale at the head inputs (see
        # test_maskrcnn_whole_model.py) so logits/deltas are sane and
        # refined boxes stay non-degenerate through all three stages
        t.proposal_generator.rpn_head.objectness_logits.weight.mul_(1e-3)
        t.proposal_generator.rpn_head.anchor_deltas.weight.mul_(1e-4)
        t.proposal_generator.rpn_head.anchor_deltas.bias.mul_(0.0)
        for pred in t.roi_heads.box_predictor:
            pred.cls_score.weight.mul_(1e-3)
            pred.cls_score.bias.mul_(0.0)
            pred.bbox_pred.weight.mul_(1e-4)
            pred.bbox_pred.bias.mul_(0.0)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (IMG, IMG))
    variables = _transfer(t, variables)
    return t, ours, variables


def _scene(torch):
    g = torch.Generator().manual_seed(43)
    img = torch.rand(3, IMG, IMG, generator=g) * 255
    boxes = torch.tensor(
        [[12.0, 16.0, 60.0, 72.0], [64.0, 40.0, 120.0, 100.0]]
    )
    classes = torch.tensor([1, 3])
    return img, boxes, classes


def test_cascade_r50fpn_loss_parity(cascade_pair, ref_cascade):
    torch = ref_cascade.torch
    t, ours, variables = cascade_pair
    Instances = ref_cascade.centernet.Instances
    Boxes = ref_cascade.centernet.Boxes

    img, boxes, classes = _scene(torch)
    inst = Instances((IMG, IMG))
    inst.gt_boxes = Boxes(boxes)
    inst.gt_classes = classes

    t.train()
    with torch.no_grad(), ref_cascade.events.EventStorage():
        losses_ref = t([{"image": img, "instances": inst}])
    t.eval()

    gt_boxes = np.zeros((1, MAX_GT, 4), np.float32)
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

    expected_keys = {"loss_rpn_cls", "loss_rpn_loc"} | {
        f"loss_{k}_stage{s}" for k in ("cls", "box_reg") for s in range(3)
    }
    assert expected_keys <= set(loss_dict), sorted(loss_dict)
    for k in sorted(expected_keys):
        rtol = 2e-3 if "box_reg" in k else 5e-4
        np.testing.assert_allclose(
            float(loss_dict[k]), float(losses_ref[k]), rtol=rtol, err_msg=k
        )


def test_cascade_r50fpn_inference_parity(cascade_pair, ref_cascade):
    """Eval forward without postprocess: last-stage refined boxes scored by
    the mean of per-stage softmax probabilities, then per-class NMS."""
    torch = ref_cascade.torch
    t, ours, variables = cascade_pair
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

    assert len(inst_ref) > 5, "degenerate scene"
    assert len(scores) == len(inst_ref), (len(scores), len(inst_ref))
    order = np.argsort(-scores)
    order_ref = np.argsort(-ref_scores)
    np.testing.assert_allclose(scores[order], ref_scores[order_ref], atol=1e-4)
    np.testing.assert_array_equal(classes[order], ref_classes[order_ref])
    np.testing.assert_allclose(boxes[order], ref_boxes[order_ref], atol=5e-3)
