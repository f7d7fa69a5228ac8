"""Rotated Faster R-CNN (reference RRPN + RROIHeads:
``proposal_generator/rrpn.py`` and ``roi_heads/rotated_fast_rcnn.py``).

Selected when a GeneralizedRCNN config names ``PROPOSAL_GENERATOR.NAME:
"RRPN"`` / ``ROI_HEADS.NAME: "RROIHeads"`` (the reference convention), or
directly via ``META_ARCHITECTURE: "RotatedRCNN"``.

Batch contract (rotated): gt_boxes are (N, M, 5) = (cx, cy, w, h, angle°).
Detections come back as (K, 5) rotated boxes; ``postprocess`` builds
``Instances.pred_boxes = RotatedBoxes`` after un-warping (isotropic warps
scale w/h and mirror flips the angle sign).
"""

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import CfgNode
from ...ops.roi_align_rotated import (
    nms_rotated_fixed,
    pairwise_iou_rotated_jnp,
    roi_align_rotated,
)
from ...structures import Instances
from ...structures.rotated_boxes import RotatedBoxes
from ..anchors import RotatedAnchorGenerator
from ..box_regression import Box2BoxTransformRotated
from ..matcher import Matcher
from ..proposal_generator.rpn import StandardRPNHead, subsample_labels
from ..proposal_generator.rrpn import (
    clip_rotated_boxes,
    find_top_rrpn_proposals,
    rrpn_losses,
)
from ..registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY
from ..roi_heads.box_head import FastRCNNConvFCHead, FastRCNNOutputLayers


class RotatedRCNNNetwork(nn.Module):
    backbone: nn.Module
    rpn_in_features: Tuple[str, ...]
    num_anchors: int
    num_classes: int
    num_fc: int
    fc_dim: int
    pooler_resolution: int = 7
    dtype: Any = jnp.float32

    def setup(self):
        self.rpn_head = StandardRPNHead(self.num_anchors, box_dim=5, dtype=self.dtype)
        self.box_head = FastRCNNConvFCHead(
            num_fc=self.num_fc, fc_dim=self.fc_dim, dtype=self.dtype
        )
        self.box_predictor = FastRCNNOutputLayers(
            self.num_classes, cls_agnostic_bbox_reg=True, box_dim=5, dtype=self.dtype
        )

    def backbone_rpn(self, images, train: bool = False):
        feats = self.backbone(images, train)
        logits, deltas = self.rpn_head([feats[f] for f in self.rpn_in_features])
        return feats, logits, deltas

    def box_predict(self, pooled, train: bool = False):
        return self.box_predictor(self.box_head(pooled, train))

    def __call__(self, images, train: bool = False):
        feats, logits, deltas = self.backbone_rpn(images, train)
        c = feats[self.rpn_in_features[0]].shape[-1]
        p = self.pooler_resolution
        self.box_predict(jnp.zeros((1, p, p, c), jnp.float32), train)
        return logits


@META_ARCH_REGISTRY.register()
class RotatedRCNN:
    def __init__(self, cfg: CfgNode) -> None:
        self.num_classes = int(cfg.MODEL.ROI_HEADS.NUM_CLASSES)
        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        self.backbone = backbone_builder(cfg, dtype=dtype)

        r = cfg.MODEL.RPN
        self.rpn_in_features = tuple(r.IN_FEATURES)
        strides_map = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64,
                       "res2": 4, "res3": 8, "res4": 16, "res5": 32,
                       "stage4": 16}
        self.rpn_strides = [strides_map[f] for f in self.rpn_in_features]
        a = cfg.MODEL.ANCHOR_GENERATOR
        self.anchor_generator = RotatedAnchorGenerator(
            a.SIZES, a.ASPECT_RATIOS, a.ANGLES, self.rpn_strides,
            offset=float(a.OFFSET),
        )
        self.num_anchors_per_cell = self.anchor_generator.num_anchors[0]
        self.rpn_matcher = Matcher(list(r.IOU_THRESHOLDS), list(r.IOU_LABELS),
                                   allow_low_quality_matches=True)
        self.rpn_box2box = Box2BoxTransformRotated((1.0, 1.0, 1.0, 1.0, 1.0))
        self.rpn_batch_size = int(r.BATCH_SIZE_PER_IMAGE)
        self.rpn_positive_fraction = float(r.POSITIVE_FRACTION)
        self.rpn_nms_thresh = float(r.NMS_THRESH)
        self.pre_nms_topk = {"train": int(r.PRE_NMS_TOPK_TRAIN), "test": int(r.PRE_NMS_TOPK_TEST)}
        self.post_nms_topk = {"train": int(r.POST_NMS_TOPK_TRAIN), "test": int(r.POST_NMS_TOPK_TEST)}

        rh = cfg.MODEL.ROI_HEADS
        self.roi_in_features = tuple(rh.IN_FEATURES)
        self.roi_strides = [strides_map[f] for f in self.roi_in_features]
        self.roi_matcher = Matcher(list(rh.IOU_THRESHOLDS), list(rh.IOU_LABELS),
                                   allow_low_quality_matches=False)
        self.roi_batch_size = int(rh.BATCH_SIZE_PER_IMAGE)
        self.roi_positive_fraction = float(rh.POSITIVE_FRACTION)
        self.score_threshold = float(rh.SCORE_THRESH_TEST)
        self.nms_threshold = float(rh.NMS_THRESH_TEST)
        self.max_detections = int(cfg.TEST.DETECTIONS_PER_IMAGE)

        bh = cfg.MODEL.ROI_BOX_HEAD
        self.box2box = Box2BoxTransformRotated(
            tuple(bh.BBOX_REG_WEIGHTS) + (1.0,) if len(bh.BBOX_REG_WEIGHTS) == 4
            else tuple(bh.BBOX_REG_WEIGHTS)
        )
        self.pooler_resolution = int(bh.POOLER_RESOLUTION)
        self.module = RotatedRCNNNetwork(
            backbone=self.backbone,
            rpn_in_features=self.rpn_in_features,
            num_anchors=self.num_anchors_per_cell,
            num_classes=self.num_classes,
            num_fc=int(bh.NUM_FC) or 2,
            fc_dim=int(bh.FC_DIM),
            pooler_resolution=int(bh.POOLER_RESOLUTION),
            dtype=dtype,
        )

    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        return (images.astype(jnp.float32) - self.pixel_mean) / self.pixel_std

    def _anchors_per_level(self, image_hw):
        grid_sizes = [(-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in self.rpn_strides]
        return [jnp.asarray(a) for a in self.anchor_generator.grid_anchors(grid_sizes)]

    @staticmethod
    def _flatten(logits, deltas):
        return (
            [l.reshape(l.shape[0], -1) for l in logits],
            [d.reshape(d.shape[0], -1, 5) for d in deltas],
        )

    def _pool(self, feats, boxes, batch_idx):
        f = self.roi_in_features[0]
        return roi_align_rotated(
            feats[f], boxes, batch_idx, 1.0 / self.roi_strides[0],
            self.pooler_resolution, 2,
        )

    # -- training -------------------------------------------------------------
    def loss_fn(self, params, batch_stats, batch):
        images = self.normalize(batch["image"])
        n, h, w, _ = images.shape
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        (feats, logits, deltas), mutated = self.module.apply(
            variables, images, True, method=RotatedRCNNNetwork.backbone_rpn,
            mutable=["batch_stats"],
        )
        anchors_per_level = self._anchors_per_level((h, w))
        anchors = jnp.concatenate(anchors_per_level, axis=0)
        lg, dl = self._flatten(logits, deltas)
        rng = batch.get("rng", jax.random.PRNGKey(0))
        rng_rpn, rng_roi = jax.random.split(rng)

        losses = rrpn_losses(
            anchors, jnp.concatenate(lg, 1), jnp.concatenate(dl, 1),
            batch["gt_boxes"], batch["gt_valid"], rng_rpn,
            self.rpn_matcher, self.rpn_box2box,
            self.rpn_batch_size, self.rpn_positive_fraction,
        )

        prop_boxes, prop_scores, prop_valid = find_top_rrpn_proposals(
            [jax.lax.stop_gradient(x) for x in lg],
            [jax.lax.stop_gradient(x) for x in dl],
            anchors_per_level, (h, w), self.rpn_box2box,
            self.rpn_nms_thresh, self.pre_nms_topk["train"], self.post_nms_topk["train"],
        )

        def sample_one(rng_i, pb, pv, gb, gc, gv):
            pb = jnp.concatenate([pb, gb], axis=0)
            pv = jnp.concatenate([pv, gv], axis=0)
            iou = pairwise_iou_rotated_jnp(gb, pb)
            iou = jnp.where(pv[None, :], iou, -1.0)
            matches, labels = self.roi_matcher(iou, gv)
            labels = jnp.where(pv, labels.astype(jnp.int32), -1)
            sel = subsample_labels(labels, self.roi_batch_size, self.roi_positive_fraction, rng_i)
            priority = jnp.where(sel == 1, 2.0, jnp.where(sel == 0, 1.0, 0.0))
            priority = priority + jax.random.uniform(rng_i, priority.shape) * 1e-3
            # cap at the candidate count: with few proposals (small images /
            # aggressive NMS) the configured batch can exceed what exists
            _, idx = jax.lax.top_k(
                priority, min(self.roi_batch_size, priority.shape[0])
            )
            sel_s = sel[idx]
            cls = jnp.where(sel_s == 1, gc[matches[idx]].astype(jnp.int32), self.num_classes)
            return {
                "boxes": pb[idx],
                "classes": cls,
                "weights": (sel_s >= 0).astype(jnp.float32),
                "target_boxes": gb[matches[idx]],
                "is_pos": sel_s == 1,
            }

        sampled = jax.vmap(sample_one)(
            jax.random.split(rng_roi, n), prop_boxes, prop_valid,
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
        )
        s = sampled["boxes"].shape[1]
        flat = {k: v.reshape((n * s,) + v.shape[2:]) for k, v in sampled.items()}
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), s)
        pooled = self._pool(feats, flat["boxes"], batch_idx)
        scores, deltas5 = self.module.apply(
            variables, pooled, True, method=RotatedRCNNNetwork.box_predict
        )

        logp = jax.nn.log_softmax(scores, axis=-1)
        ce = -jnp.take_along_axis(logp, flat["classes"][:, None], axis=1)[:, 0]
        num_valid = jnp.maximum(flat["weights"].sum(), 1.0)
        losses["loss_cls"] = (ce * flat["weights"]).sum() / num_valid
        gt_deltas = self.box2box.get_deltas(flat["boxes"], flat["target_boxes"])
        reg = jnp.abs(deltas5 - gt_deltas).sum(-1)
        pos_w = (flat["is_pos"] & (flat["weights"] > 0)).astype(jnp.float32)
        losses["loss_box_reg"] = (reg * pos_w).sum() / num_valid

        total = sum(losses.values())
        return total, (losses, mutated.get("batch_stats", batch_stats))

    # -- inference ------------------------------------------------------------
    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = self.normalize(images)
        n, h, w, _ = x.shape
        feats, logits, deltas = self.module.apply(
            variables, x, False, method=RotatedRCNNNetwork.backbone_rpn
        )
        anchors_per_level = self._anchors_per_level((h, w))
        lg, dl = self._flatten(logits, deltas)
        prop_boxes, _, prop_valid = find_top_rrpn_proposals(
            lg, dl, anchors_per_level, (h, w), self.rpn_box2box,
            self.rpn_nms_thresh, self.pre_nms_topk["test"], self.post_nms_topk["test"],
        )
        p = prop_boxes.shape[1]
        batch_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), p)
        pooled = self._pool(feats, prop_boxes.reshape(n * p, 5), batch_idx)
        scores, deltas5 = self.module.apply(
            variables, pooled, False, method=RotatedRCNNNetwork.box_predict
        )
        probs = jax.nn.softmax(scores.reshape(n, p, -1), axis=-1)[..., : self.num_classes]
        boxes5 = self.box2box.apply_deltas(
            deltas5.reshape(n, p, 5), prop_boxes
        )
        # reference fast_rcnn_inference_single_image_rotated clips the
        # regressed boxes (near-horizontal only) BEFORE score filtering/NMS
        # (rotated_fast_rcnn.py:104-107)
        boxes5 = clip_rotated_boxes(boxes5, (h, w))

        def infer_one(pb, pv, pr):
            # full (proposal, class) candidate grid + per-class NMS — the
            # reference's fast_rcnn_inference_single_image_rotated
            # (rotated_fast_rcnn.py): every class whose score clears the
            # threshold is a candidate, suppression only within a class.
            np_, nc = pr.shape
            sc_grid = jnp.where(
                pv[:, None] & (pr > self.score_threshold), pr, -jnp.inf
            )
            m = min(4 * self.max_detections, np_ * nc)
            top_sc, top_idx = jax.lax.top_k(sc_grid.reshape(-1), m)
            prop_idx = top_idx // nc
            cls = (top_idx % nc).astype(jnp.int32)
            cand = pb[prop_idx]  # class-agnostic box regression
            keep, valid = nms_rotated_fixed(
                cand, top_sc, self.nms_threshold, self.max_detections,
                classes=cls,
            )
            return {
                "boxes": cand[keep],
                "scores": jnp.where(valid, top_sc[keep], 0.0),
                "classes": cls[keep],
            }

        return jax.vmap(infer_one)(boxes5, prop_valid, probs)

    # -- host boundary ----------------------------------------------------------
    def postprocess(self, dets, warps, orig_sizes) -> List[Dict[str, Instances]]:
        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["scores"])
        classes = np.asarray(dets["classes"])
        results = []
        for i, (oh, ow) in enumerate(orig_sizes):
            keep = scores[i] > self.score_threshold
            b, s, c = boxes[i][keep].copy(), scores[i][keep], classes[i][keep]
            if warps is not None and len(b):
                m = np.asarray(warps[i], np.float64)
                sx, sy = m[0, 0], m[1, 1]
                assert abs(abs(sx) - abs(sy)) < 1e-4, "rotated unwarp needs isotropic scale"
                scale = abs(sx)
                ctr = (b[:, :2] - m[:, 2]) @ np.linalg.inv(m[:, :2]).T
                b[:, :2] = ctr
                b[:, 2:4] /= scale
                if sx < 0:  # mirrored warp flips the angle
                    b[:, 4] = -b[:, 4]
            inst = Instances((oh, ow))
            rb = RotatedBoxes(b.astype(np.float32))
            rb.clip((oh, ow))
            inst.pred_boxes = rb
            inst.scores = s.astype(np.float32)
            inst.pred_classes = c.astype(np.int64)
            results.append({"instances": inst})
        return results
