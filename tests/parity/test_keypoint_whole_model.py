"""Whole-model Keypoint R-CNN R50-FPN golden parity.

The reference's keypoint pipeline on top of GeneralizedRCNN
(roi_heads.py:707-758 + keypoint_head.py): fg-proposal selection with the
visible-keypoint filter, 14x14 pooling, 8x conv512 + deconv + 2x bilinear
head, position-softmax CE normalized by visible keypoints
(NORMALIZE_LOSSES_BY_VISIBLE_KEYPOINTS=True default), and eval-time
heatmap decode.  Module goldens cover the head and the two heatmap codecs
(test_module_parity); this composes them through the full model so the
wiring — matched-gt gather, visible-in-roi masking, loss normalizer, det-box
re-pooling at eval — is pinned too.

Keep-everything sampling as in test_maskrcnn_whole_model.py.  The
reference's visible-keypoint proposal filter (roi_heads.py:83-120) drops
fg proposals with zero visible keypoints from pooling entirely; here they
keep their slot with every keypoint invisible — identical numerator and
denominator (the loss normalizes by the visible count).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg

from .conftest import seed_torch_module, to_nhwc
from .test_module_parity import _transfer

NUM_CLASSES = 2  # keypoint configs use person-only heads; 2 keeps it general
NUM_KEYPOINTS = 17
MAX_GT = 8
POST_NMS_TRAIN = 64
IMG = 128


def _keypoint_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = NUM_KEYPOINTS
    # keep-everything sampling (see test_maskrcnn_whole_model.py)
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
    cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_SAMPLING_RATIO = 2
    cfg.MODEL.PIXEL_MEAN = [103.530, 116.280, 123.675]
    cfg.MODEL.PIXEL_STD = [1.0, 1.0, 1.0]
    cfg.INPUT.DYNAMIC = True
    cfg.MODEL.CENTERNET.MAX_OBJS = MAX_GT
    cfg.TPU.DTYPE = "float32"
    cfg.TEST.EXACT_MODE = True
    return cfg


@pytest.fixture(scope="session")
def keypoint_pair(ref_rcnn):
    torch = ref_rcnn.torch
    cfg = _keypoint_cfg()
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
        # Keep keypoint logits in a sane softmax regime: the seeded conv512
        # tower gains ~6.8x per layer (randn*0.1, fan-in 512*9), so by the
        # deconv the logits reach ~1e7 and the reference decode's
        # pool-resolution softmax sum underflows to 0 (NaN scores, internal
        # assert at keypoints.py:199).  Scale each conv to ~unit gain and
        # the predictor to a few-unit logit spread.
        for mod in t.roi_heads.keypoint_head.modules():
            if isinstance(mod, torch.nn.Conv2d):
                mod.weight.mul_(0.15)
        t.roi_heads.keypoint_head.score_lowres.weight.mul_(5e-4)
    t.eval()

    from detectron2_centernet_tpu.models import build_model

    ours = build_model(cfg)
    variables = ours.init(jax.random.PRNGKey(0), (IMG, IMG))
    variables = _transfer(t, variables)
    return t, ours, variables


def _scene(torch):
    g = torch.Generator().manual_seed(47)
    img = torch.rand(3, IMG, IMG, generator=g) * 255
    boxes = torch.tensor(
        [[12.0, 16.0, 60.0, 72.0], [64.0, 40.0, 120.0, 100.0]]
    )
    classes = torch.tensor([0, 1])
    # 17 keypoints per instance spread inside each gt box; a few invisible
    # (v=0) and a couple v=1 (labeled-but-occluded counts as visible)
    kps = np.zeros((2, NUM_KEYPOINTS, 3), np.float32)
    rng = np.random.RandomState(7)
    for i, (x1, y1, x2, y2) in enumerate(boxes.tolist()):
        kps[i, :, 0] = rng.uniform(x1 + 2, x2 - 2, NUM_KEYPOINTS)
        kps[i, :, 1] = rng.uniform(y1 + 2, y2 - 2, NUM_KEYPOINTS)
        kps[i, :, 2] = 2
        kps[i, 3:6, 2] = 0      # invisible: no loss
        kps[i, 10:12, 2] = 1
    return img, boxes, classes, kps


def test_keypoint_r50fpn_loss_parity(keypoint_pair, ref_rcnn):
    torch = ref_rcnn.torch
    t, ours, variables = keypoint_pair
    import importlib

    Instances = ref_rcnn.centernet.Instances
    Boxes = ref_rcnn.centernet.Boxes
    Keypoints = importlib.import_module(
        "detectron2.structures.keypoints"
    ).Keypoints

    img, boxes, classes, kps = _scene(torch)
    inst = Instances((IMG, IMG))
    inst.gt_boxes = Boxes(boxes)
    inst.gt_classes = classes
    inst.gt_keypoints = Keypoints(torch.from_numpy(kps))

    t.train()
    with torch.no_grad(), ref_rcnn.events.EventStorage():
        losses_ref = t([{"image": img, "instances": inst}])
    t.eval()

    gt_boxes = np.zeros((1, MAX_GT, 4), np.float32)
    gt_classes = np.zeros((1, MAX_GT), np.int32)
    gt_valid = np.zeros((1, MAX_GT), bool)
    gt_kps = np.zeros((1, MAX_GT, NUM_KEYPOINTS, 3), np.float32)
    gt_boxes[0, :2] = boxes.numpy()
    gt_classes[0, :2] = classes.numpy()
    gt_valid[0, :2] = True
    gt_kps[0, :2] = kps
    batch = {
        "image": jnp.asarray(to_nhwc(img.unsqueeze(0))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_keypoints": jnp.asarray(gt_kps),
    }
    _, (loss_dict, _) = ours.loss_fn(
        variables["params"], variables.get("batch_stats", {}), batch
    )

    for k, rtol in (
        ("loss_rpn_cls", 5e-4),
        ("loss_rpn_loc", 5e-4),
        ("loss_cls", 5e-4),
        ("loss_box_reg", 2e-3),
        ("loss_keypoint", 5e-3),
    ):
        np.testing.assert_allclose(
            float(loss_dict[k]), float(losses_ref[k]), rtol=rtol, err_msg=k
        )


def test_keypoint_r50fpn_inference_parity(keypoint_pair, ref_rcnn):
    """Eval forward without postprocess: detections plus decoded keypoints
    (x, y, score) from the heatmaps pooled at the final detection boxes."""
    torch = ref_rcnn.torch
    t, ours, variables = keypoint_pair
    img, _, _, _ = _scene(torch)

    with torch.no_grad():
        out = t.inference([{"image": img}], do_postprocess=False)
    inst_ref = out[0]
    ref_scores = inst_ref.scores.numpy()
    ref_boxes = inst_ref.pred_boxes.tensor.numpy()
    ref_kps = inst_ref.pred_keypoints.numpy()  # (K, 17, 3)

    dets = ours.predict_fn(variables, jnp.asarray(to_nhwc(img.unsqueeze(0))))
    scores = np.asarray(dets["scores"])[0]
    keep = scores > ours.score_threshold
    scores = scores[keep]
    boxes = np.asarray(dets["boxes"])[0][keep]
    heatmaps = np.asarray(dets["keypoint_heatmaps"])[0][keep]

    from detectron2_centernet_tpu.structures.keypoints import (
        heatmaps_to_keypoints,
    )

    # ours returns (N, K, 4) = (x, y, logit, prob); the reference's
    # pred_keypoints keeps columns [0, 1, 3] (keypoint_head.py:123)
    kps = heatmaps_to_keypoints(heatmaps, boxes)[:, :, [0, 1, 3]]

    assert len(inst_ref) > 3, "degenerate scene"
    assert len(scores) == len(inst_ref), (len(scores), len(inst_ref))
    order = np.argsort(-scores)
    order_ref = np.argsort(-ref_scores)
    np.testing.assert_allclose(scores[order], ref_scores[order_ref], atol=1e-4)
    np.testing.assert_allclose(boxes[order], ref_boxes[order_ref], atol=5e-3)
    # x/y decoded coordinates in image pixels; scores are raw logits
    np.testing.assert_allclose(
        kps[order][..., :2], ref_kps[order_ref][..., :2], atol=0.1
    )
    np.testing.assert_allclose(
        kps[order][..., 2], ref_kps[order_ref][..., 2], atol=1e-3
    )
