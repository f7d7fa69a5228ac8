"""Whole-model Mask R-CNN R50-FPN golden parity (round-3 VERDICT item 4).

The reference's COMPLETE two-stage pipeline — GeneralizedRCNN
(rcnn.py:132-183): backbone -> RPN -> proposal NMS -> label-and-sample ->
box/mask heads -> per-class NMS — runs on CPU torch (through the conftest's
exact numpy roi_align stub), its weights transfer through the production
aligner, and train-mode loss dicts plus eval-mode detections are compared
against our jitted implementation.  The module-level goldens
(test_module_parity.py) verify each block; these tests catch wiring bugs
BETWEEN the verified blocks (proposal ordering, box-transform plumbing,
sampling sets, mask-head gather).

Randomized-subsampling noise is neutralized with the keep-everything trick:
BATCH_SIZE_PER_IMAGE >= all candidates on both sides makes subsample_labels
(sampling.py:9-55) keep every positive and negative, so the sampled SET is
deterministic and the losses (set-wise means) are permutation-invariant.

Known tolerance: loss_mask compares at 5% — our mask targets crop
fixed-size gt-box-relative rasters (static shapes; mask_head.py:87) while
the reference crops the full-image bitmask (masks.py:169), so bin values
at mask boundaries differ slightly by design (docs/DESIGN.md).
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


def _maskrcnn_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    # keep-everything sampling (see module docstring).  The default anchor
    # generator emits 5 sizes x 3 aspects per location (~20.5k anchors at
    # IMG=128 over p2-p6), so the budget must exceed ALL negatives or the
    # reference subsamples them with the unseeded global RNG and
    # loss_rpn_cls varies ~1e-3 run-to-run (flaked at 8192).
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 65536
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS_TRAIN + MAX_GT
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = POST_NMS_TRAIN
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 128
    # Base-RCNN-FPN head shapes (configs/Base-RCNN-FPN.yaml)
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    # adaptive (0) sampling is data-dependent; pin 2x2 on both sides
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.ROI_MASK_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True  # reference pads by divisibility only
    cfg.INPUT.MASK_RASTER = 28
    cfg.MODEL.CENTERNET.MAX_OBJS = MAX_GT
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="module")
def maskrcnn_pair(ref_rcnn):
    torch = ref_rcnn.torch
    cfg = _maskrcnn_cfg()
    t = ref_rcnn.rcnn.GeneralizedRCNN(cfg.clone())
    saved = {
        k: v.clone()
        for k, v in t.named_buffers()
        if "anchor" in k or "pixel" in k
    }
    seed_torch_module(t)
    with torch.no_grad():
        for k, v in saved.items():
            dict(t.named_buffers())[k].copy_(v)
        # seeded R50 amplifies activations to ~1e3 at head inputs; rescale
        # the predictors so logits/deltas land in a diverse, sane regime
        # (no score ties, boxes near the proposals)
        t.proposal_generator.rpn_head.objectness_logits.weight.mul_(1e-3)
        t.proposal_generator.rpn_head.anchor_deltas.weight.mul_(1e-4)
        t.proposal_generator.rpn_head.anchor_deltas.bias.mul_(0.0)
        t.roi_heads.box_predictor.cls_score.weight.mul_(1e-3)
        t.roi_heads.box_predictor.cls_score.bias.mul_(0.0)
        t.roi_heads.box_predictor.bbox_pred.weight.mul_(1e-4)
        t.roi_heads.box_predictor.bbox_pred.bias.mul_(0.0)
        # decisive mask logits (sigmoid probs away from the 0.5 threshold)
        t.roi_heads.mask_head.predictor.weight.mul_(1e-2)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (IMG, IMG))
    variables = _transfer(t, variables)
    return t, ours, variables


def _scene(torch):
    g = torch.Generator().manual_seed(41)
    img = torch.rand(3, IMG, IMG, generator=g) * 255
    boxes = torch.tensor(
        [[12.0, 16.0, 60.0, 72.0], [64.0, 40.0, 120.0, 100.0]]
    )
    classes = torch.tensor([1, 3])
    return img, boxes, classes


def _bit_masks_left_half(torch, boxes, hw):
    """Full-image bitmasks: the left half of each gt box is foreground."""
    m = torch.zeros((len(boxes), hw, hw), dtype=torch.bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes.tolist()):
        m[i, int(y1) : int(y2), int(x1) : int((x1 + x2) / 2)] = True
    return m


def test_maskrcnn_r50fpn_loss_parity(maskrcnn_pair, ref_rcnn):
    torch = ref_rcnn.torch
    t, ours, variables = maskrcnn_pair
    Instances = ref_rcnn.centernet.Instances
    Boxes = ref_rcnn.centernet.Boxes
    BitMasks = ref_rcnn.structures_masks.BitMasks

    img, boxes, classes = _scene(torch)
    inst = Instances((IMG, IMG))
    inst.gt_boxes = Boxes(boxes)
    inst.gt_classes = classes
    inst.gt_masks = BitMasks(_bit_masks_left_half(torch, boxes, IMG))

    t.train()
    with torch.no_grad(), ref_rcnn.events.EventStorage():
        losses_ref = t([{"image": img, "instances": inst}])
    t.eval()

    gt_boxes = np.zeros((1, MAX_GT, 4), np.float32)
    gt_classes = np.zeros((1, MAX_GT), np.int32)
    gt_valid = np.zeros((1, MAX_GT), bool)
    gt_boxes[0, :2] = boxes.numpy()
    gt_classes[0, :2] = classes.numpy()
    gt_valid[0, :2] = True
    # gt-box-relative rasters of the same left-half masks
    r = 28
    rasters = np.zeros((1, MAX_GT, r, r), np.float32)
    rasters[0, :2, :, : r // 2] = 1.0
    batch = {
        "image": jnp.asarray(to_nhwc(img.unsqueeze(0))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(rasters),
    }
    _, (loss_dict, _) = ours.loss_fn(
        variables["params"], variables.get("batch_stats", {}), batch
    )

    for k, rtol in (
        ("loss_rpn_cls", 5e-4),
        ("loss_rpn_loc", 5e-4),
        ("loss_cls", 5e-4),
        ("loss_box_reg", 2e-3),
        ("loss_mask", 5e-2),
    ):
        np.testing.assert_allclose(
            float(loss_dict[k]), float(losses_ref[k]), rtol=rtol, err_msg=k
        )


def test_maskrcnn_r50fpn_inference_parity(maskrcnn_pair, ref_rcnn):
    """Eval forward without postprocess: boxes/scores/classes after the
    full pipeline plus the 28x28 per-detection mask probabilities
    (mask_rcnn_inference leaves probs unthresholded; pasting is covered by
    the paste_masks_in_image pixel-identical golden)."""
    torch = ref_rcnn.torch
    t, ours, variables = maskrcnn_pair
    img, _, _ = _scene(torch)

    with torch.no_grad():
        out = t.inference([{"image": img}], do_postprocess=False)
    inst_ref = out[0]
    ref_scores = inst_ref.scores.numpy()
    ref_boxes = inst_ref.pred_boxes.tensor.numpy()
    ref_classes = inst_ref.pred_classes.numpy()
    ref_masks = inst_ref.pred_masks.numpy()  # (K, 1, 28, 28) probs

    dets = ours.predict_fn(variables, jnp.asarray(to_nhwc(img.unsqueeze(0))))
    scores = np.asarray(dets["scores"])[0]
    keep = scores > ours.score_threshold
    scores = scores[keep]
    boxes = np.asarray(dets["boxes"])[0][keep]
    classes = np.asarray(dets["classes"])[0][keep]
    masks = np.asarray(dets["masks"])[0][keep]  # (K, 28, 28) probs

    assert len(inst_ref) > 5, "degenerate scene"
    assert len(scores) == len(inst_ref), (len(scores), len(inst_ref))
    order = np.argsort(-scores)
    order_ref = np.argsort(-ref_scores)
    np.testing.assert_allclose(
        scores[order], ref_scores[order_ref], atol=1e-4
    )
    np.testing.assert_array_equal(
        classes[order], ref_classes[order_ref]
    )
    np.testing.assert_allclose(
        boxes[order], ref_boxes[order_ref], atol=5e-3
    )
    np.testing.assert_allclose(
        masks[order], ref_masks[:, 0][order_ref], atol=5e-3
    )
