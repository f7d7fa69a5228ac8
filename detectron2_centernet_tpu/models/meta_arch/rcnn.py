"""GeneralizedRCNN (reference ``detectron2/modeling/meta_arch/rcnn.py:25``).

Two-stage detector: backbone(+FPN) → RPN → ROI heads, re-designed with the
framework's static-shape contract:

  * RPN emits a FIXED number of proposals per image (post-NMS top-k slots with
    a validity mask) instead of variable-length Instances lists;
  * proposal sampling (512 @ 0.25 positive) is a randomized top-k over masked
    slots, seeded from the train step's folded rng (``batch["rng"]``);
  * ROI pooling is the gather-based ROIAlign (ops/roi_align.py) over the FPN
    pyramid with level assignment, one batched call for all N*S rois;
  * losses and decode run under one jit; the host boundary only sees fixed-K
    detections (postprocess -> Instances, like the other meta-archs).

Supports ``StandardROIHeads`` (FPN, box path) and ``Res5ROIHeads`` (C4).
"""

import logging
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import CfgNode
from ...ops.roi_align import multilevel_roi_align, roi_align
from ...structures import Boxes, Instances
from ..anchors import build_anchor_generator
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher
from ..roi_heads.extension import ROIContext, build_roi_head_extensions

logger = logging.getLogger(__name__)
from ..proposal_generator.rpn import (
    StandardRPNHead,
    find_top_rpn_proposals,
    rpn_losses,
)
from ..backbones.resnet import RESNET_SPECS, BottleneckBlock
from ..registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY
from ..roi_heads.box_head import FastRCNNConvFCHead, FastRCNNOutputLayers
from ..roi_heads.keypoint_head import (
    KRCNNConvDeconvUpsampleHead,
    encode_keypoint_targets,
    keypoint_rcnn_loss,
)
from ..roi_heads.mask_head import (
    CoarseMaskHead,
    MaskRCNNConvUpsampleHead,
    crop_gt_masks,
    mask_rcnn_loss,
)
from ..roi_heads.point_head import (
    PointHead,
    point_sample,
    refine_mask_with_points,
    sample_uncertain_points,
)
from ..roi_heads.roi_heads import (
    fast_rcnn_inference,
    fast_rcnn_losses,
    label_and_sample_proposals,
)


def _clip_boxes(boxes: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip XYXY boxes to [0, w] x [0, h] (reference Boxes.clip)."""
    h, w = hw
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


@jax.custom_vjp
def _scale_gradient_impl(x, scale):
    return x


def _scale_gradient_fwd(x, scale):
    return x, scale


def _scale_gradient_bwd(scale, g):
    return (g * scale, None)


_scale_gradient_impl.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)


def _scale_gradient(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity whose backward multiplies the cotangent by ``scale``
    (reference cascade _ScaleGradient, cascade_rcnn.py:269-276: stage losses
    sum, but feature gradients scale 1/num_stages)."""
    return _scale_gradient_impl(x, jnp.float32(scale))


class RCNNNetwork(nn.Module):
    """All parameterized pieces in one flax module; the pure logic between
    them lives in the meta-arch and runs inside the same jit."""

    backbone: nn.Module
    rpn_in_features: Tuple[str, ...]
    num_anchors: int
    roi_type: str  # "standard" | "res5"
    num_classes: int
    num_conv: int
    conv_dim: int
    num_fc: int
    fc_dim: int
    cls_agnostic: bool
    pooler_resolution: int = 7
    mask_on: bool = False
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_head_name: str = "MaskRCNNConvUpsampleHead"
    mask_fc_dim: int = 1024
    mask_num_fc: int = 2
    mask_output_side: int = 7
    mask_pooler_resolution: int = 14
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_conv_dims: Tuple[int, ...] = (512,) * 8
    keypoint_pooler_resolution: int = 14
    point_rend_on: bool = False
    point_fc_dim: int = 256
    point_num_fc: int = 3
    # Res5ROIHeads (C4): the res5 stage runs on pooled 14x14 rois
    # (reference roi_heads.py:345-475)
    res5_reps: int = 3
    res5_out_channels: int = 2048
    res5_bottleneck_channels: int = 512
    res5_stride_in_1x1: bool = True
    res5_norm: str = "FrozenBN"
    # CascadeROIHeads (reference cascade_rcnn.py:32): one head+predictor per
    # stage, class-agnostic box regression
    cascade_stages: int = 3
    # pluggable per-roi heads (roi_heads/extension.py); projects register
    # extensions without editing this file
    extensions: Tuple[Any, ...] = ()
    dtype: Any = jnp.float32

    def setup(self):
        self.rpn_head = StandardRPNHead(self.num_anchors, dtype=self.dtype)
        if self.roi_type == "cascade":
            self.box_heads = [
                FastRCNNConvFCHead(
                    num_conv=self.num_conv, conv_dim=self.conv_dim,
                    num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype,
                    name=f"box_head_stage{i}",
                )
                for i in range(self.cascade_stages)
            ]
            self.box_predictors = [
                FastRCNNOutputLayers(
                    self.num_classes, cls_agnostic_bbox_reg=True,
                    dtype=self.dtype, name=f"box_predictor_stage{i}",
                )
                for i in range(self.cascade_stages)
            ]
        else:
            if self.roi_type == "standard":
                self.box_head = FastRCNNConvFCHead(
                    num_conv=self.num_conv, conv_dim=self.conv_dim,
                    num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype,
                )
            self.box_predictor = FastRCNNOutputLayers(
                self.num_classes, cls_agnostic_bbox_reg=self.cls_agnostic, dtype=self.dtype
            )
        if self.roi_type == "res5":
            self.res5_blocks = [
                BottleneckBlock(
                    self.res5_out_channels, self.res5_bottleneck_channels,
                    stride=2 if b == 0 else 1,
                    stride_in_1x1=self.res5_stride_in_1x1,
                    norm=self.res5_norm, dtype=self.dtype, name=f"res5_block{b}",
                )
                for b in range(self.res5_reps)
            ]
        if self.mask_on:
            if self.mask_head_name == "CoarseMaskHead":
                self.mask_head = CoarseMaskHead(
                    self.num_classes, conv_dim=self.mask_conv_dim,
                    fc_dim=self.mask_fc_dim, num_fc=self.mask_num_fc,
                    output_side=self.mask_output_side, dtype=self.dtype,
                )
            else:
                self.mask_head = MaskRCNNConvUpsampleHead(
                    self.num_classes, num_conv=self.mask_num_conv,
                    conv_dim=self.mask_conv_dim, dtype=self.dtype,
                )
        if self.keypoint_on:
            self.keypoint_head = KRCNNConvDeconvUpsampleHead(
                self.num_keypoints, conv_dims=tuple(self.keypoint_conv_dims),
                dtype=self.dtype,
            )
        if self.point_rend_on:
            self.point_head = PointHead(
                1, fc_dim=self.point_fc_dim, num_fc=self.point_num_fc,
                dtype=self.dtype,
            )
        self.ext_modules = {
            ext.name: ext.build_module(self.dtype) for ext in self.extensions
        }

    def backbone_rpn(self, images, train: bool = False):
        feats = self.backbone(images, train)
        rpn_feats = [feats[f] for f in self.rpn_in_features]
        logits, deltas = self.rpn_head(rpn_feats)
        return feats, logits, deltas

    def res5_transform(self, pooled, train: bool = False):
        """C4 shared per-roi transform: the res5 stage on 14x14 pooled rois
        (reference Res5ROIHeads._shared_roi_transform, roi_heads.py:411-413)
        — its 7x7 output feeds BOTH the box predictor and the mask head."""
        x = pooled
        for block in self.res5_blocks:
            x = block(x, train)
        return x

    def box_predict_shared(self, shared):
        """(scores, deltas) from an already-res5-transformed roi feature;
        the predictor global-avg-pools the 7x7 input (roi_heads.py:430-434)."""
        return self.box_predictor(shared)

    def box_predict(self, pooled, train: bool = False, stage: int = 0):
        """pooled (R, P, P, C) -> (scores, deltas)."""
        if self.roi_type == "cascade":
            x = self.box_heads[stage](pooled, train)
            return self.box_predictors[stage](x)
        if self.roi_type == "standard":
            x = self.box_head(pooled, train)
        else:
            x = self.res5_transform(pooled, train)
        return self.box_predictor(x)

    def mask_predict(self, pooled, train: bool = False):
        """pooled (R, P, P, C) -> (R, 2P, 2P, num_classes) mask logits."""
        return self.mask_head(pooled, train)

    def keypoint_predict(self, pooled, train: bool = False):
        """pooled (R, P, P, C) -> (R, 4P, 4P, K) keypoint logits."""
        return self.keypoint_head(pooled, train)

    def point_predict(self, fine, coarse):
        """fine (..., P, Cf) + coarse logits (..., P, 1) -> (..., P, 1)."""
        return self.point_head(fine, coarse)

    def ext_predict(self, name, *args, train: bool = False):
        """Invoke a registered extension head module by name."""
        return self.ext_modules[name](*args, train=train)

    def __call__(self, images, train: bool = False):
        # init path: trace every submodule once
        feats, logits, deltas = self.backbone_rpn(images, train)
        f0 = feats[self.rpn_in_features[0]]
        c = f0.shape[-1]
        p = self.pooler_resolution
        dummy_pooled = jnp.zeros((1, p, p, c), f0.dtype)
        if self.roi_type == "cascade":
            for i in range(self.cascade_stages):
                self.box_predict(dummy_pooled, train, stage=i)
        else:
            self.box_predict(dummy_pooled, train)
        if self.mask_on:
            if self.roi_type == "res5":
                # C4: the mask head consumes the shared res5 output
                # (res5_out_channels at half the box pooler resolution)
                self.mask_predict(
                    jnp.zeros((1, p // 2, p // 2, self.res5_out_channels), f0.dtype),
                    train,
                )
            else:
                mp = self.mask_pooler_resolution
                self.mask_predict(jnp.zeros((1, mp, mp, c), f0.dtype), train)
        if self.keypoint_on:
            kp = self.keypoint_pooler_resolution
            self.keypoint_predict(jnp.zeros((1, kp, kp, c), f0.dtype), train)
        if self.point_rend_on:
            self.point_predict(
                jnp.zeros((1, 4, c), f0.dtype), jnp.zeros((1, 4, 1), jnp.float32)
            )
        for ext in self.extensions:
            dummy_args = [
                jnp.zeros(shape, dt or f0.dtype)
                for shape, dt in ext.init_shapes(c)
            ]
            self.ext_predict(ext.name, *dummy_args, train=train)
        return logits


@META_ARCH_REGISTRY.register()
class GeneralizedRCNN:
    def __init__(self, cfg: CfgNode) -> None:
        self.num_classes = int(cfg.MODEL.ROI_HEADS.NUM_CLASSES)
        self.extensions = build_roi_head_extensions(cfg)
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        self.backbone = backbone_builder(cfg, dtype=dtype)
        self.is_fpn = "fpn" in cfg.MODEL.BACKBONE.NAME

        r = cfg.MODEL.RPN
        self.rpn_in_features = tuple(r.IN_FEATURES)
        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128,
                       "res2": 4, "res3": 8, "res4": 16, "res5": 32}
        # backbones with non-FPN level naming (HRFPN's p1 is stride 4)
        # declare their own strides
        strides_map.update(getattr(self.backbone, "out_feature_strides", {}))
        self.rpn_strides = [strides_map[f] for f in self.rpn_in_features]
        self.anchor_generator = build_anchor_generator(cfg, self.rpn_strides)
        self.num_anchors_per_cell = self.anchor_generator.num_anchors[0]
        self.rpn_matcher = Matcher(list(r.IOU_THRESHOLDS), list(r.IOU_LABELS),
                                   allow_low_quality_matches=True)
        self.rpn_box2box = Box2BoxTransform(tuple(r.BBOX_REG_WEIGHTS))
        self.rpn_batch_size = int(r.BATCH_SIZE_PER_IMAGE)
        self.rpn_positive_fraction = float(r.POSITIVE_FRACTION)
        self.rpn_nms_thresh = float(r.NMS_THRESH)
        self.rpn_smooth_l1_beta = float(r.SMOOTH_L1_BETA)
        self.pre_nms_topk = {"train": int(r.PRE_NMS_TOPK_TRAIN), "test": int(r.PRE_NMS_TOPK_TEST)}
        self.post_nms_topk = {"train": int(r.POST_NMS_TOPK_TRAIN), "test": int(r.POST_NMS_TOPK_TEST)}
        self.rpn_loss_weight = float(r.LOSS_WEIGHT)

        rh = cfg.MODEL.ROI_HEADS
        self.roi_type = {
            "StandardROIHeads": "standard",
            "PointRendROIHeads": "standard",  # reference PointRend ROI head
            "DensePoseROIHeads": "standard",  # densepose rides the extension
            "CascadeROIHeads": "cascade",
        }.get(rh.NAME, "res5")
        ch = cfg.MODEL.ROI_BOX_CASCADE_HEAD
        self.cascade_ious = list(ch.IOUS)
        self.cascade_weights = [Box2BoxTransform(tuple(w)) for w in ch.BBOX_REG_WEIGHTS]
        self.roi_in_features = tuple(rh.IN_FEATURES)
        self.roi_strides = [strides_map[f] for f in self.roi_in_features]
        self.roi_matcher = Matcher(list(rh.IOU_THRESHOLDS), list(rh.IOU_LABELS),
                                   allow_low_quality_matches=False)
        self.roi_batch_size = int(rh.BATCH_SIZE_PER_IMAGE)
        self.roi_positive_fraction = float(rh.POSITIVE_FRACTION)
        self.score_threshold = float(rh.SCORE_THRESH_TEST)
        self.nms_threshold = float(rh.NMS_THRESH_TEST)
        self.max_detections = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.proposal_append_gt = bool(rh.PROPOSAL_APPEND_GT)
        # MODEL.LOAD_PROPOSALS: proposals come precomputed from the data
        # pipeline (reference proposal_generator/build.py:18-22 — name
        # "PrecomputedProposals" builds no RPN)
        self.precomputed_proposals = (
            cfg.MODEL.PROPOSAL_GENERATOR.NAME == "PrecomputedProposals"
            or bool(cfg.MODEL.LOAD_PROPOSALS)
        )

        self.mask_on = bool(cfg.MODEL.MASK_ON)
        mh = cfg.MODEL.ROI_MASK_HEAD
        self.mask_pooler_resolution = int(mh.POOLER_RESOLUTION)
        self.point_rend_on = bool(cfg.MODEL.MASK_ON) and (
            mh.NAME == "PointRendMaskHead"
            or bool(mh.POINT_HEAD_ON)  # the reference PointRend combo
            or rh.NAME == "PointRendROIHeads"
        )
        ph = cfg.MODEL.POINT_HEAD
        self.point_train_num = int(ph.TRAIN_NUM_POINTS)
        self.point_oversample = int(ph.OVERSAMPLE_RATIO)
        self.point_importance = float(ph.IMPORTANCE_SAMPLE_RATIO)
        self.point_steps = int(ph.SUBDIVISION_STEPS)
        self.point_subdiv_num = int(ph.SUBDIVISION_NUM_POINTS)
        self.keypoint_on = bool(cfg.MODEL.KEYPOINT_ON)
        kh = cfg.MODEL.ROI_KEYPOINT_HEAD
        self.num_keypoints = int(kh.NUM_KEYPOINTS)
        self.keypoint_pooler_resolution = int(kh.POOLER_RESOLUTION)
        self.keypoint_loss_weight = float(kh.LOSS_WEIGHT)

        bh = cfg.MODEL.ROI_BOX_HEAD
        self.box2box = Box2BoxTransform(tuple(bh.BBOX_REG_WEIGHTS))
        self.smooth_l1_beta = float(bh.SMOOTH_L1_BETA)
        self.pooler_resolution = int(bh.POOLER_RESOLUTION)
        # Reference SAMPLING_RATIO=0 means adaptive ceil(roi/bin) samples per
        # bin (poolers.py); adaptive counts are data-dependent shapes, so the
        # TPU pooler approximates 0 with a fixed 2x2 grid (warn once).
        self.pooler_sampling_ratio = int(bh.POOLER_SAMPLING_RATIO)
        if self.pooler_sampling_ratio == 0:
            logger.warning(
                "ROI_BOX_HEAD.POOLER_SAMPLING_RATIO=0 (adaptive) is "
                "approximated with a fixed 2x2 sample grid on TPU."
            )
            self.pooler_sampling_ratio = 2
        num_conv, num_fc = int(bh.NUM_CONV), int(bh.NUM_FC)
        if self.roi_type != "res5" and num_conv == 0 and num_fc == 0:
            # an FPN box head needs at least one layer; keep the legacy
            # defaults-compatible shape but say so instead of coercing zeros
            logger.warning(
                "ROI_BOX_HEAD.NUM_CONV and NUM_FC are both 0; defaulting to "
                "the standard 2-fc head (set either explicitly to silence)."
            )
            num_fc = 2

        self.module = RCNNNetwork(
            backbone=self.backbone,
            rpn_in_features=self.rpn_in_features,
            num_anchors=self.num_anchors_per_cell,
            roi_type=self.roi_type,
            num_classes=self.num_classes,
            num_conv=num_conv,
            conv_dim=int(bh.CONV_DIM),
            num_fc=num_fc,
            fc_dim=int(bh.FC_DIM),
            cls_agnostic=bool(bh.CLS_AGNOSTIC_BBOX_REG),
            pooler_resolution=int(bh.POOLER_RESOLUTION),
            res5_reps=RESNET_SPECS.get(cfg.MODEL.RESNETS.DEPTH, ("bottleneck", (3, 4, 6, 3)))[1][3],
            res5_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS * 8,
            res5_bottleneck_channels=cfg.MODEL.RESNETS.NUM_GROUPS
            * cfg.MODEL.RESNETS.WIDTH_PER_GROUP * 8,
            res5_stride_in_1x1=bool(cfg.MODEL.RESNETS.STRIDE_IN_1X1),
            res5_norm=cfg.MODEL.RESNETS.NORM,
            cascade_stages=len(self.cascade_ious),
            mask_on=self.mask_on,
            mask_num_conv=int(mh.NUM_CONV),
            mask_conv_dim=int(mh.CONV_DIM),
            mask_head_name=str(mh.NAME),
            mask_fc_dim=int(mh.FC_DIM),
            mask_num_fc=int(mh.NUM_FC),
            mask_output_side=int(mh.OUTPUT_SIDE_RESOLUTION),
            mask_pooler_resolution=int(mh.POOLER_RESOLUTION),
            keypoint_on=self.keypoint_on,
            num_keypoints=self.num_keypoints,
            keypoint_conv_dims=tuple(int(d) for d in kh.CONV_DIMS),
            keypoint_pooler_resolution=int(kh.POOLER_RESOLUTION),
            point_rend_on=self.point_rend_on,
            point_fc_dim=int(ph.FC_DIM),
            point_num_fc=int(ph.NUM_FC),
            extensions=tuple(self.extensions),
            dtype=dtype,
        )

    # -- plumbing -------------------------------------------------------------
    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        return (x - self.pixel_mean) / self.pixel_std

    def _anchors_per_level(self, image_hw):
        grid_sizes = [(-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in self.rpn_strides]
        return [jnp.asarray(a) for a in self.anchor_generator.grid_anchors(grid_sizes)]

    @staticmethod
    def _flatten_rpn(logits, deltas):
        lg = [l.reshape(l.shape[0], -1) for l in logits]
        dl = [d.reshape(d.shape[0], -1, 4) for d in deltas]
        return lg, dl

    def _proposals(self, logits, deltas, anchors_per_level, image_hw, mode):
        lg, dl = self._flatten_rpn(logits, deltas)
        return find_top_rpn_proposals(
            lg, dl, anchors_per_level, image_hw, self.rpn_box2box,
            nms_thresh=self.rpn_nms_thresh,
            pre_nms_topk=self.pre_nms_topk[mode],
            post_nms_topk=self.post_nms_topk[mode],
        )

    def _pool(self, feats: Dict[str, jnp.ndarray], boxes: jnp.ndarray, batch_idx: jnp.ndarray, resolution=None):
        """boxes (R, 4) input coords + batch_idx (R,) -> pooled (R, P, P, C)."""
        resolution = resolution or self.pooler_resolution
        if len(self.roi_in_features) == 1:
            f = self.roi_in_features[0]
            return roi_align(
                feats[f], boxes, batch_idx, 1.0 / self.roi_strides[0],
                resolution, self.pooler_sampling_ratio,
            )
        return multilevel_roi_align(
            [feats[f] for f in self.roi_in_features], self.roi_strides,
            boxes, batch_idx, resolution, self.pooler_sampling_ratio,
        )

    def _cascade_relabel(self, boxes, gt_boxes, gt_classes, gt_valid, weights, iou_thr):
        """Re-label refined boxes vs gt at ``iou_thr`` (reference
        _match_and_label_boxes, cascade_rcnn.py:174-215). Returns a
        flat sampled-dict; padding slots keep weight 0."""
        from ...ops.nms import pairwise_iou_xyxy

        n, s_slots, _ = boxes.shape

        def per_image(b, gb, gc, gv):
            iou = pairwise_iou_xyxy(gb, b)  # (M, S)
            iou = jnp.where(gv[:, None], iou, -1.0)
            matched = jnp.argmax(iou, axis=0)
            best = jnp.max(iou, axis=0)
            is_pos = best >= iou_thr
            cls = jnp.where(is_pos, gc[matched].astype(jnp.int32), self.num_classes)
            return cls, gb[matched], matched, is_pos

        cls, tgt, midx, is_pos = jax.vmap(per_image)(
            boxes, gt_boxes, gt_classes, gt_valid
        )
        flat = lambda x: x.reshape((n * s_slots,) + x.shape[2:])
        return {
            "boxes": flat(boxes),
            "classes": flat(cls),
            "weights": flat(weights),
            "target_boxes": flat(tgt),
            "matched_idx": flat(midx),
            "is_pos": flat(is_pos),
        }

    # -- training -------------------------------------------------------------
    def loss_fn(self, params, batch_stats, batch):
        images = self.normalize(batch["image"])
        n, h, w, _ = images.shape
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (feats, logits, deltas), mutated = self.module.apply(
            variables, images, True, method=RCNNNetwork.backbone_rpn,
            mutable=["batch_stats"],
        )
        anchors_per_level = self._anchors_per_level((h, w))
        anchors = jnp.concatenate(anchors_per_level, axis=0)
        lg, dl = self._flatten_rpn(logits, deltas)
        # batch size from the RPN outputs, not the images: branch-folding
        # backbones (TridentNet) emit more feature maps than input images
        n = lg[0].shape[0]
        rng = batch.get("rng")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng_rpn, rng_roi, rng_point = jax.random.split(rng, 3)

        if self.precomputed_proposals:
            # Fast R-CNN workflow (MODEL.LOAD_PROPOSALS, reference
            # build.py:102 + proposal_generator/build.py:21): proposals come
            # from the batch, no RPN losses
            losses = {}
            prop_boxes = batch["proposal_boxes"]
            prop_valid = batch["proposal_valid"]
        else:
            losses = rpn_losses(
                anchors, jnp.concatenate(lg, 1), jnp.concatenate(dl, 1),
                batch["gt_boxes"], batch["gt_valid"], rng_rpn,
                self.rpn_matcher, self.rpn_box2box,
                self.rpn_batch_size, self.rpn_positive_fraction, self.rpn_smooth_l1_beta,
            )
            losses = {k: v * self.rpn_loss_weight for k, v in losses.items()}

            prop_boxes, prop_scores, prop_valid = self._proposals(
                [jax.lax.stop_gradient(x) for x in logits],
                [jax.lax.stop_gradient(x) for x in deltas],
                anchors_per_level, (h, w), "train",
            )

        sample_fn = jax.vmap(
            lambda rng_i, pb, pv, gb, gc, gv: label_and_sample_proposals(
                pb, pv, gb, gc, gv, rng_i, self.roi_matcher,
                self.roi_batch_size, self.roi_positive_fraction,
                self.num_classes, self.proposal_append_gt,
            )
        )
        sampled = sample_fn(
            jax.random.split(rng_roi, n), prop_boxes, prop_valid,
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        )  # dict of (N, S, ...)

        s = sampled["boxes"].shape[1]
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), s)
        flat_sampled = {k: v.reshape((n * s,) + v.shape[2:]) for k, v in sampled.items()}

        if self.roi_type == "cascade":
            # reference CascadeROIHeads (cascade_rcnn.py:96-172): stage 0
            # trains on the sampled rois; later stages on the previous
            # stage's refined boxes CLIPPED to the image and with empty
            # boxes dropped (_create_proposals_from_boxes, :278-295 —
            # weight 0 is the static-shape equivalent of the nonempty
            # filter: fast_rcnn_losses normalizes by the weight sum), then
            # re-labeled at increasing IoU
            cur = sampled["boxes"]  # (N, S, 4)
            cur_sampled = dict(flat_sampled)
            cur_weights = flat_sampled["weights"].reshape(n, s)
            for t, (iou_t, b2b) in enumerate(zip(self.cascade_ious, self.cascade_weights)):
                if t > 0:
                    cur = _clip_boxes(cur, (h, w))
                    nonempty = (cur[..., 2] > cur[..., 0]) & (cur[..., 3] > cur[..., 1])
                    cur_weights = cur_weights * nonempty.astype(cur_weights.dtype)
                    cur_sampled = self._cascade_relabel(
                        cur, batch["gt_boxes"], batch["gt_classes"],
                        batch["gt_valid"], cur_weights, iou_t,
                    )
                # the original cascade averages stage losses but scales the
                # head gradients back up — equivalent to summing the losses
                # with feature gradients scaled 1/num_stages
                # (reference _ScaleGradient, cascade_rcnn.py:269-276)
                pooled = _scale_gradient(
                    self._pool(feats, cur.reshape(n * s, 4), batch_idx),
                    1.0 / len(self.cascade_ious),
                )
                scores, deltas4 = self.module.apply(
                    variables, pooled, True, method=RCNNNetwork.box_predict,
                    stage=t,
                )
                stage_loss = fast_rcnn_losses(
                    scores, deltas4, cur_sampled, b2b,
                    self.num_classes, self.smooth_l1_beta,
                )
                losses.update({f"{k}_stage{t}": v for k, v in stage_loss.items()})
                refined = b2b.apply_deltas(deltas4, cur.reshape(n * s, 4))
                cur = jax.lax.stop_gradient(refined).reshape(n, s, 4)
        else:
            pooled = self._pool(feats, sampled["boxes"].reshape(n * s, 4), batch_idx)
            res5_shared = None
            if self.roi_type == "res5":
                # C4: one shared res5 transform feeds box predictor AND mask
                # head (reference Res5ROIHeads.forward, roi_heads.py:415-441)
                res5_shared = self.module.apply(
                    variables, pooled, True, method=RCNNNetwork.res5_transform
                )
                scores, box_deltas = self.module.apply(
                    variables, res5_shared, method=RCNNNetwork.box_predict_shared
                )
            else:
                scores, box_deltas = self.module.apply(
                    variables, pooled, True, method=RCNNNetwork.box_predict
                )
            roi_loss = fast_rcnn_losses(
                scores, box_deltas, flat_sampled, self.box2box,
                self.num_classes, self.smooth_l1_beta,
            )
            losses.update(roi_loss)
        flat_boxes = sampled["boxes"].reshape(n * s, 4)

        if self.mask_on and "gt_masks" in batch:
            if self.roi_type == "res5" and res5_shared is not None:
                mask_input = res5_shared
            else:
                mask_input = self._pool(
                    feats, flat_boxes, batch_idx, self.mask_pooler_resolution
                )
            mask_logits = self.module.apply(
                variables, mask_input, True, method=RCNNNetwork.mask_predict
            )  # (N*S, 2P, 2P, C)
            crop_fn = jax.vmap(
                lambda rasters, gb, midx, rois: crop_gt_masks(
                    rasters.astype(jnp.float32), gb, midx, rois,
                    mask_logits.shape[1],
                )
            )
            gt_crop = crop_fn(
                batch["gt_masks"], batch["gt_boxes"],
                sampled["matched_idx"], sampled["boxes"],
            ).reshape(n * s, mask_logits.shape[1], mask_logits.shape[2])
            fg = (
                flat_sampled["is_pos"] & (flat_sampled["weights"] > 0)
            ).astype(jnp.float32)
            losses["loss_mask"] = mask_rcnn_loss(
                mask_logits, gt_crop, flat_sampled["classes"], fg
            )

            if self.point_rend_on:
                # sample uncertain points on each roi's gt-class coarse mask,
                # refine with the point head, supervise at the gt mask values
                cls = jnp.clip(flat_sampled["classes"], 0, self.num_classes - 1)
                sel_logits = jnp.take_along_axis(
                    mask_logits, cls[:, None, None, None], axis=3
                )[..., 0]  # (N*S, P2, P2)
                fine_key = self.roi_in_features[0]
                fine_pooled = self._pool(
                    feats, flat_boxes, batch_idx, self.mask_pooler_resolution * 2
                )  # (N*S, 2P, 2P, C)
                # dedicated stream: rng_rpn/rng_roi already consumed the
                # step key's first splits (independent point sampling)
                rngs = jax.random.split(rng_point, sel_logits.shape[0])

                def per_roi(rng_i, lg, fine, gtr):
                    pts = sample_uncertain_points(
                        lg, rng_i, self.point_train_num,
                        self.point_oversample, self.point_importance,
                    )
                    fine_v = point_sample(fine, pts)
                    coarse_v = point_sample(lg[:, :, None], pts)
                    tgt = point_sample(gtr[:, :, None], pts)[:, 0]
                    return fine_v, coarse_v, tgt

                fine_v, coarse_v, tgt = jax.vmap(per_roi)(
                    rngs, sel_logits, fine_pooled, gt_crop
                )
                point_logits = self.module.apply(
                    variables, fine_v, coarse_v, method=RCNNNetwork.point_predict
                )[..., 0]  # (N*S, P)
                t = (tgt > 0.5).astype(jnp.float32)
                ce = (
                    jnp.maximum(point_logits, 0)
                    - point_logits * t
                    + jnp.log1p(jnp.exp(-jnp.abs(point_logits)))
                )
                num_fg = jnp.maximum(fg.sum(), 1.0)
                losses["loss_mask_point"] = (
                    ce.mean(axis=1) * fg
                ).sum() / num_fg

        if self.keypoint_on and "gt_keypoints" in batch:
            kp_pooled = self._pool(
                feats, flat_boxes, batch_idx, self.keypoint_pooler_resolution
            )
            kp_logits = self.module.apply(
                variables, kp_pooled, True, method=RCNNNetwork.keypoint_predict
            )  # (N*S, Hm, Hm, K)
            matched_kp = jnp.take_along_axis(
                batch["gt_keypoints"],
                sampled["matched_idx"][..., None, None],
                axis=1,
            ).reshape(n * s, self.num_keypoints, 3)
            kp_idx, kp_valid = encode_keypoint_targets(
                matched_kp, flat_boxes, kp_logits.shape[1]
            )
            fg_kp = (
                flat_sampled["is_pos"] & (flat_sampled["weights"] > 0)
            ).astype(jnp.float32)
            losses["loss_keypoint"] = (
                keypoint_rcnn_loss(kp_logits, kp_idx, kp_valid, fg_kp)
                * self.keypoint_loss_weight
            )
        for ext in self.extensions:
            ctx = ROIContext(
                feats=feats,
                pool=lambda bx, bi, res=None: self._pool(feats, bx, bi, res),
                apply=lambda name, *a, train=True: self.module.apply(
                    variables, name, *a, train=train,
                    method=RCNNNetwork.ext_predict,
                ),
                n=n,
                num_classes=self.num_classes,
                image_hw=(h, w),
                rng=jax.random.fold_in(rng, 17),
                batch=batch,
                sampled=sampled,
                flat_sampled=flat_sampled,
            )
            losses.update(ext.loss(ctx))

        total = sum(losses.values())
        new_stats = mutated.get("batch_stats", batch_stats)
        return total, (losses, new_stats)

    # -- inference ------------------------------------------------------------
    def predict_fn(
        self,
        variables,
        images: jnp.ndarray,
        proposal_boxes: Optional[jnp.ndarray] = None,
        proposal_valid: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        x = self.normalize(images)
        n, h, w, _ = x.shape
        feats, logits, deltas = self.module.apply(
            variables, x, False, method=RCNNNetwork.backbone_rpn
        )
        if self.precomputed_proposals:
            assert proposal_boxes is not None and proposal_valid is not None, (
                "MODEL.LOAD_PROPOSALS inference needs proposal_boxes/"
                "proposal_valid from the batch"
            )
            prop_boxes, prop_valid = proposal_boxes, proposal_valid
            prop_scores = jnp.where(prop_valid, 0.0, -jnp.inf)
        else:
            anchors_per_level = self._anchors_per_level((h, w))
            prop_boxes, prop_scores, prop_valid = self._proposals(
                logits, deltas, anchors_per_level, (h, w), "test"
            )
        p = prop_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), p)
        if self.roi_type == "cascade":
            # run all stages; average stage scores, keep final refined boxes.
            # Stage k>0 inputs are the previous refinements clipped to the
            # image (reference _create_proposals_from_boxes); the final boxes
            # stay unclipped here — fast_rcnn_inference clips, like the
            # reference's fast_rcnn_inference_single_image
            cur = prop_boxes
            stage_scores = []
            for t, b2b in enumerate(self.cascade_weights):
                if t > 0:
                    cur = _clip_boxes(cur, (h, w))
                pooled = self._pool(feats, cur.reshape(n * p, 4), batch_idx)
                sc, deltas4 = self.module.apply(
                    variables, pooled, False, method=RCNNNetwork.box_predict,
                    stage=t,
                )
                stage_scores.append(jax.nn.softmax(sc, axis=-1))
                cur = b2b.apply_deltas(deltas4, cur.reshape(n * p, 4)).reshape(n, p, 4)
            mean_probs = sum(stage_scores) / len(stage_scores)
            # feed log-probs so fast_rcnn_inference's softmax recovers them
            scores = jnp.log(jnp.maximum(mean_probs, 1e-12)).reshape(n, p, -1)
            box_deltas = jnp.zeros((n, p, 4), jnp.float32)
            prop_boxes = cur
        else:
            pooled = self._pool(feats, prop_boxes.reshape(n * p, 4), batch_idx)
            scores, box_deltas = self.module.apply(
                variables, pooled, False, method=RCNNNetwork.box_predict
            )
            scores = scores.reshape(n, p, -1)
            box_deltas = box_deltas.reshape(n, p, -1)
        flat_boxes = prop_boxes.reshape(n * p, 4)

        infer_fn = jax.vmap(
            lambda pb, pv, sc, bd: fast_rcnn_inference(
                pb, pv, sc, bd, self.box2box, self.num_classes, (h, w),
                self.score_threshold, self.nms_threshold, self.max_detections,
            )
        )
        dets = infer_fn(prop_boxes, prop_valid, scores, box_deltas)
        if self.mask_on:
            k = dets["boxes"].shape[1]
            det_boxes = dets["boxes"].reshape(n * k, 4)
            det_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
            if self.roi_type == "res5":
                # C4 eval re-runs the shared res5 transform on the final
                # detection boxes (reference forward_with_given_boxes ->
                # _shared_roi_transform, roi_heads.py:443-466)
                mask_pooled = self.module.apply(
                    variables,
                    self._pool(feats, det_boxes, det_idx),
                    False,
                    method=RCNNNetwork.res5_transform,
                )
            else:
                mask_pooled = self._pool(
                    feats, det_boxes, det_idx, self.mask_pooler_resolution
                )
            mask_logits = self.module.apply(
                variables, mask_pooled, False, method=RCNNNetwork.mask_predict
            )
            cls = jnp.clip(dets["classes"].reshape(n * k), 0, self.num_classes - 1)
            sel = jnp.take_along_axis(
                mask_logits, cls[:, None, None, None], axis=3
            )[..., 0]
            if self.point_rend_on:
                fine_pooled = self._pool(
                    feats, det_boxes, det_idx, self.mask_pooler_resolution * 2
                )

                def refine_one(lg, fine):
                    return refine_mask_with_points(
                        lg, fine,
                        lambda fv, cv: self.module.apply(
                            variables, fv, cv, method=RCNNNetwork.point_predict
                        ),
                        self.point_subdiv_num, self.point_steps,
                    )

                sel = jax.vmap(refine_one)(sel, fine_pooled)
            p2 = sel.shape[-1]
            dets["masks"] = jax.nn.sigmoid(sel).reshape(n, k, p2, p2)
        if self.keypoint_on:
            k = dets["boxes"].shape[1]
            det_boxes = dets["boxes"].reshape(n * k, 4)
            det_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
            kp_pooled = self._pool(
                feats, det_boxes, det_idx, self.keypoint_pooler_resolution
            )
            kp_logits = self.module.apply(
                variables, kp_pooled, False, method=RCNNNetwork.keypoint_predict
            )
            hm = kp_logits.shape[1]
            dets["keypoint_heatmaps"] = kp_logits.reshape(
                n, k, hm, hm, self.num_keypoints
            )
        for ext in self.extensions:
            ctx = ROIContext(
                feats=feats,
                pool=lambda bx, bi, res=None: self._pool(feats, bx, bi, res),
                apply=lambda name, *a, train=False: self.module.apply(
                    variables, name, *a, train=train,
                    method=RCNNNetwork.ext_predict,
                ),
                n=n,
                num_classes=self.num_classes,
                image_hw=(h, w),
                dets=dets,
            )
            dets.update(ext.inference(ctx))
        return dets

    # -- host boundary --------------------------------------------------------
    def postprocess(self, dets, warps, orig_sizes) -> List[Dict[str, Instances]]:
        from ...structures.masks import paste_masks_in_image

        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["scores"])
        classes = np.asarray(dets["classes"])
        masks = np.asarray(dets["masks"]) if "masks" in dets else None
        results = []
        for i, (oh, ow) in enumerate(orig_sizes):
            keep = scores[i] > self.score_threshold
            b, s, c = boxes[i][keep], scores[i][keep], classes[i][keep]
            if warps is not None:
                from ...data.detection_utils import unwarp_boxes

                b = unwarp_boxes(warps[i], b)
            inst = Instances((oh, ow))
            bx = Boxes(b.astype(np.float32))
            bx.clip((oh, ow))
            ne = bx.nonempty()  # detector_postprocess drops empty boxes
            keep = keep.copy()
            keep[np.flatnonzero(keep)[~ne]] = False  # stays a (K,) slot mask
            b, s, c = b[ne], s[ne], c[ne]
            bx = bx[ne]
            inst.pred_boxes = bx
            inst.scores = s.astype(np.float32)
            inst.pred_classes = c.astype(np.int64)
            if masks is not None:
                inst.pred_masks = paste_masks_in_image(
                    masks[i][keep], np.asarray(bx.tensor), (oh, ow)
                )
            if "keypoint_heatmaps" in dets:
                from ...structures.keypoints import heatmaps_to_keypoints

                hm = np.asarray(dets["keypoint_heatmaps"])[i][keep]
                inst.pred_keypoints = heatmaps_to_keypoints(
                    hm, np.asarray(bx.tensor)
                )[:, :, [0, 1, 3]]  # x, y, score
            # extension outputs (any extra (N, K, ...) field) pass through
            known = {"boxes", "scores", "classes", "masks", "keypoint_heatmaps"}
            for key, val in dets.items():
                if key in known:
                    continue
                arr = np.asarray(val[i])
                if arr.shape[:1] == keep.shape:
                    inst.set(key, arr[keep])
            results.append({"instances": inst})
        return results


@META_ARCH_REGISTRY.register()
class ProposalNetwork(GeneralizedRCNN):
    """RPN-only model (reference rcnn.py:261-321): predict_fn returns the
    proposal boxes/scores as detections (class 0)."""

    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = self.normalize(images)
        n, h, w, _ = x.shape
        feats, logits, deltas = self.module.apply(
            variables, x, False, method=RCNNNetwork.backbone_rpn
        )
        anchors_per_level = self._anchors_per_level((h, w))
        boxes, scores, valid = self._proposals(logits, deltas, anchors_per_level, (h, w), "test")
        return {
            "boxes": boxes,
            "scores": jnp.where(valid, jax.nn.sigmoid(scores), 0.0),
            "classes": jnp.zeros(scores.shape, jnp.int32),
        }

    def loss_fn(self, params, batch_stats, batch):
        images = self.normalize(batch["image"])
        n, h, w, _ = images.shape
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (feats, logits, deltas), mutated = self.module.apply(
            variables, images, True, method=RCNNNetwork.backbone_rpn,
            mutable=["batch_stats"],
        )
        anchors = jnp.concatenate(self._anchors_per_level((h, w)), axis=0)
        lg, dl = self._flatten_rpn(logits, deltas)
        rng = batch.get("rng", jax.random.PRNGKey(0))
        losses = rpn_losses(
            anchors, jnp.concatenate(lg, 1), jnp.concatenate(dl, 1),
            batch["gt_boxes"], batch["gt_valid"], rng,
            self.rpn_matcher, self.rpn_box2box,
            self.rpn_batch_size, self.rpn_positive_fraction, self.rpn_smooth_l1_beta,
        )
        total = sum(losses.values())
        return total, (losses, mutated.get("batch_stats", batch_stats))
