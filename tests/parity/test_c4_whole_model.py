"""Whole-model Mask R-CNN R50-C4 golden parity.

The reference's C4 pipeline — GeneralizedRCNN with Res5ROIHeads
(roi_heads.py:345-466): single-level res4 RPN -> 14x14 pooling -> the
SHARED res5 transform whose 7x7 output feeds both the global-avg-pooled
box predictor and the mask head; eval re-runs the shared transform on the
final detection boxes (forward_with_given_boxes).  This pins the C4
family's distinctive wiring, which the FPN whole-model goldens don't
touch: res5-inside-the-roi-head, the shared box/mask feature, and the
num_conv=0 deconv-only mask head.

Keep-everything sampling as in test_maskrcnn_whole_model.py.
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
POST_NMS_TRAIN = 48
IMG = 128


def _c4_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 0  # C4 mask head: deconv + predictor
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 14
    cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO = 2
    # keep-everything sampling (see test_maskrcnn_whole_model.py); res4 at
    # IMG=128 is 8x8 x 15 anchors = 960 candidates
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 4096
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = POST_NMS_TRAIN + MAX_GT
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = POST_NMS_TRAIN
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True
    cfg.INPUT.MASK_RASTER = 28
    cfg.MODEL.CENTERNET.MAX_OBJS = MAX_GT
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="session")
def c4_pair(ref_rcnn):
    torch = ref_rcnn.torch
    cfg = _c4_cfg()
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
        t.proposal_generator.rpn_head.objectness_logits.weight.mul_(1e-3)
        t.proposal_generator.rpn_head.anchor_deltas.weight.mul_(1e-4)
        t.proposal_generator.rpn_head.anchor_deltas.bias.mul_(0.0)
        t.roi_heads.box_predictor.cls_score.weight.mul_(1e-3)
        t.roi_heads.box_predictor.cls_score.bias.mul_(0.0)
        t.roi_heads.box_predictor.bbox_pred.weight.mul_(1e-4)
        t.roi_heads.box_predictor.bbox_pred.bias.mul_(0.0)
        t.roi_heads.mask_head.predictor.weight.mul_(1e-3)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (IMG, IMG))
    variables = _transfer(t, variables)
    return t, ours, variables


def _scene(torch):
    g = torch.Generator().manual_seed(53)
    img = torch.rand(3, IMG, IMG, generator=g) * 255
    boxes = torch.tensor(
        [[12.0, 16.0, 60.0, 72.0], [64.0, 40.0, 120.0, 100.0]]
    )
    classes = torch.tensor([1, 3])
    return img, boxes, classes


def _bit_masks_left_half(torch, boxes, hw):
    m = torch.zeros((len(boxes), hw, hw), dtype=torch.bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes.tolist()):
        m[i, int(y1) : int(y2), int(x1) : int((x1 + x2) / 2)] = True
    return m


def test_c4_maskrcnn_loss_parity(c4_pair, ref_rcnn):
    torch = ref_rcnn.torch
    t, ours, variables = c4_pair
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
        ("loss_box_reg", 5e-3),
        ("loss_mask", 5e-2),
    ):
        np.testing.assert_allclose(
            float(loss_dict[k]), float(losses_ref[k]), rtol=rtol, err_msg=k
        )


def test_c4_maskrcnn_inference_parity(c4_pair, ref_rcnn):
    """Eval forward without postprocess: boxes/scores/classes plus the
    14x14 mask probabilities from the re-run shared res5 transform."""
    torch = ref_rcnn.torch
    t, ours, variables = c4_pair
    img, _, _ = _scene(torch)

    with torch.no_grad():
        out = t.inference([{"image": img}], do_postprocess=False)
    inst_ref = out[0]
    ref_scores = inst_ref.scores.numpy()
    ref_boxes = inst_ref.pred_boxes.tensor.numpy()
    ref_classes = inst_ref.pred_classes.numpy()
    ref_masks = inst_ref.pred_masks.numpy()  # (K, 1, 14, 14) probs

    dets = ours.predict_fn(variables, jnp.asarray(to_nhwc(img.unsqueeze(0))))
    scores = np.asarray(dets["scores"])[0]
    keep = scores > ours.score_threshold
    scores = scores[keep]
    boxes = np.asarray(dets["boxes"])[0][keep]
    classes = np.asarray(dets["classes"])[0][keep]
    masks = np.asarray(dets["masks"])[0][keep]

    assert len(inst_ref) > 3, "degenerate scene"
    assert len(scores) == len(inst_ref), (len(scores), len(inst_ref))
    # order by box coordinates, not score rank: near-tied scores make the
    # score argsort permutation implementation-defined
    order = np.lexsort(np.round(boxes, 2).T)
    order_ref = np.lexsort(np.round(ref_boxes, 2).T)
    np.testing.assert_allclose(scores[order], ref_scores[order_ref], atol=1e-4)
    np.testing.assert_array_equal(classes[order], ref_classes[order_ref])
    np.testing.assert_allclose(boxes[order], ref_boxes[order_ref], atol=5e-3)
    np.testing.assert_allclose(
        masks[order], ref_masks[:, 0][order_ref], atol=5e-3
    )
