"""RetinaNet (reference ``detectron2/modeling/meta_arch/retinanet.py``).

One-stage FPN detector: ResNet-FPN p3..p7, shared 4-conv cls/box towers
(``RetinaNetHead`` :405-489), anchor matching with the low-quality rescue
(:235-322), sigmoid focal + smooth-L1 losses (:189-234), per-level top-k →
score threshold → class-aware NMS inference (:323-404).

TPU redesign mirrors the CenterNet meta-arch contract: fixed-shape batches
(gt slots masked by ``gt_valid``), one jitted ``loss_fn``/``predict_fn``,
fixed K detection slots out of NMS (ops/nms.py), host-side ``postprocess``.
Loss normalization: ``MODEL.RETINANET.LOSS_NORMALIZER`` — "ema" reproduces
the reference's momentum-0.9 running foreground count (:91-92,216-218;
the scalar rides in ``batch_stats`` so it checkpoints/resumes with the BN
statistics), "batch" (default) is the stateless in-batch count.
"""

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...config import CfgNode
from ...structures import Boxes, Instances
from ..anchors import build_anchor_generator
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher
from ...ops.nms import batched_nms_fixed, pairwise_iou_xyxy
from ..registry import BACKBONE_REGISTRY, META_ARCH_REGISTRY


class RetinaNetHead(nn.Module):
    """Shared cls/box towers applied to every pyramid level
    (reference :405-489)."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        # build the tower layers once; apply to each level (weight sharing)
        # reference init (:468-480): every conv N(0, 0.01), cls bias to the
        # prior-prob logit so the initial loss is sane
        w_init = nn.initializers.normal(0.01)
        cls_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=w_init,
                    dtype=self.dtype, name=f"cls_tower{i}")
            for i in range(self.num_convs)
        ]
        box_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", kernel_init=w_init,
                    dtype=self.dtype, name=f"box_tower{i}")
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            kernel_init=w_init,
            bias_init=nn.initializers.constant(bias_value),
            dtype=jnp.float32, name="cls_score",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", kernel_init=w_init,
            dtype=jnp.float32, name="bbox_pred"
        )
        logits, bbox_reg = [], []
        for f in features:
            c = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            logits.append(cls_score(c.astype(jnp.float32)))
            b = f
            for conv in box_convs:
                b = nn.relu(conv(b))
            bbox_reg.append(bbox_pred(b.astype(jnp.float32)))
        return logits, bbox_reg


class RetinaNetModel(nn.Module):
    backbone: nn.Module
    in_features: Tuple[str, ...]
    num_classes: int
    num_anchors: int
    num_convs: int
    prior_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        pyramid = self.backbone(images.astype(self.dtype), train)
        feats = [pyramid[f] for f in self.in_features]
        return RetinaNetHead(
            self.num_classes,
            self.num_anchors,
            self.num_convs,
            channels=feats[0].shape[-1],
            prior_prob=self.prior_prob,
            dtype=self.dtype,
            name="head",
        )(feats)


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Per-element focal loss (fvcore semantics used by the reference)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable binary cross entropy from logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def smooth_l1(pred, target, beta: float):
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


@META_ARCH_REGISTRY.register()
class RetinaNet:
    """Functional meta-arch with the framework-wide contract."""

    def __init__(self, cfg: CfgNode) -> None:
        r = cfg.MODEL.RETINANET
        self.num_classes = int(r.NUM_CLASSES)
        self.in_features = tuple(r.IN_FEATURES)
        self.focal_alpha = float(r.FOCAL_LOSS_ALPHA)
        self.focal_gamma = float(r.FOCAL_LOSS_GAMMA)
        self.smooth_l1_beta = float(r.SMOOTH_L1_LOSS_BETA)
        self.score_threshold = float(r.SCORE_THRESH_TEST)
        self.topk_candidates = int(r.TOPK_CANDIDATES_TEST)
        self.nms_threshold = float(r.NMS_THRESH_TEST)
        self.max_detections = int(cfg.TEST.DETECTIONS_PER_IMAGE)
        self.loss_normalizer_mode = str(r.LOSS_NORMALIZER)
        assert self.loss_normalizer_mode in ("batch", "ema")

        self.pixel_mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
        self.pixel_std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)
        dtype = jnp.bfloat16 if cfg.TPU.DTYPE == "bfloat16" else jnp.float32
        self.dtype = dtype

        backbone_builder = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
        self.backbone = backbone_builder(cfg, dtype=dtype)

        strides = {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
        self.strides = [strides[f] for f in self.in_features]
        self.anchor_generator = build_anchor_generator(cfg, self.strides)
        self.num_anchors_per_cell = self.anchor_generator.num_anchors[0]
        assert all(n == self.num_anchors_per_cell for n in self.anchor_generator.num_anchors)
        self.box2box = Box2BoxTransform(tuple(r.BBOX_REG_WEIGHTS))
        self.matcher = Matcher(
            list(r.IOU_THRESHOLDS), list(r.IOU_LABELS), allow_low_quality_matches=True
        )

        self.module = RetinaNetModel(
            backbone=self.backbone,
            in_features=self.in_features,
            num_classes=self.num_classes,
            num_anchors=self.num_anchors_per_cell,
            num_convs=int(r.NUM_CONVS),
            prior_prob=float(r.PRIOR_PROB),
            dtype=dtype,
        )

    # -- shared plumbing ------------------------------------------------------
    def init(self, rng: jax.Array, image_size: Tuple[int, int] = (512, 512)):
        dummy = jnp.zeros((1, image_size[0], image_size[1], 3), jnp.float32)
        return self.module.init(rng, dummy, train=False)

    def normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32)
        return (x - self.pixel_mean) / self.pixel_std

    def _anchors_for(self, image_hw: Tuple[int, int]) -> jnp.ndarray:
        grid_sizes = [
            (-(-image_hw[0] // s), -(-image_hw[1] // s)) for s in self.strides
        ]
        return jnp.asarray(self.anchor_generator(grid_sizes))  # (R, 4)

    @staticmethod
    def _flatten_preds(logits, bbox_reg, num_classes):
        """Per-level NHWC heads -> (N, R, C) and (N, R, 4) in anchor order."""
        cls_list, box_list = [], []
        for lg, bx in zip(logits, bbox_reg):
            n, h, w, _ = lg.shape
            cls_list.append(lg.reshape(n, h * w * (lg.shape[-1] // num_classes), num_classes))
            box_list.append(bx.reshape(n, -1, 4))
        return jnp.concatenate(cls_list, axis=1), jnp.concatenate(box_list, axis=1)

    # -- training -------------------------------------------------------------
    def label_anchors(self, anchors, gt_boxes, gt_classes, gt_valid):
        """Per-image anchor labeling (reference :235-322). Returns
        (gt_labels (R,) int32 in [0..C] with C=background, -1 ignore;
        matched_boxes (R, 4))."""
        iou = pairwise_iou_xyxy(gt_boxes, anchors)  # (M, R)
        matches, labels = self.matcher(iou, gt_valid)
        matched_boxes = gt_boxes[matches]
        matched_cls = gt_classes[matches]
        gt_labels = jnp.where(
            labels == 1,
            matched_cls.astype(jnp.int32),
            jnp.where(labels == 0, self.num_classes, -1).astype(jnp.int32),
        )
        return gt_labels, matched_boxes

    def loss_fn(self, params, batch_stats, batch):
        images = self.normalize(batch["image"])
        # the EMA loss normalizer rides in batch_stats (it is a running
        # statistic with the BN-stats lifecycle); strip it before apply
        batch_stats = dict(batch_stats) if batch_stats else {}
        prev_normalizer = batch_stats.pop("loss_normalizer", None)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = self.module.apply(variables, images, train=True, mutable=["batch_stats"])
        (logits, bbox_reg), mutated = out
        n, h, w, _ = images.shape
        anchors = self._anchors_for((h, w))
        cls_pred, box_pred = self._flatten_preds(logits, bbox_reg, self.num_classes)

        label_fn = jax.vmap(self.label_anchors, in_axes=(None, 0, 0, 0))
        gt_labels, matched_boxes = label_fn(
            anchors, batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"]
        )  # (N, R), (N, R, 4)

        pos = gt_labels < self.num_classes
        pos = pos & (gt_labels >= 0)
        num_pos = jnp.maximum(pos.sum(), 1.0)
        valid = gt_labels >= 0
        if self.loss_normalizer_mode == "ema":
            # reference retinanet.py:216-218: momentum-0.9 running fg count,
            # updated before use, initialized at 100
            if prev_normalizer is None:
                prev_normalizer = jnp.asarray(100.0, jnp.float32)
            normalizer = 0.9 * prev_normalizer + 0.1 * num_pos
        else:
            normalizer = num_pos

        targets = jax.nn.one_hot(
            jnp.where(pos, gt_labels, self.num_classes), self.num_classes, dtype=jnp.float32
        )
        cls_loss = sigmoid_focal_loss(
            cls_pred, targets, self.focal_alpha, self.focal_gamma
        )
        cls_loss = jnp.where(valid[..., None], cls_loss, 0.0).sum() / normalizer

        deltas_gt = self.box2box.get_deltas(anchors[None], matched_boxes)
        reg = smooth_l1(box_pred, deltas_gt, self.smooth_l1_beta)
        reg_loss = jnp.where(pos[..., None], reg, 0.0).sum() / normalizer

        loss_dict = {"loss_cls": cls_loss, "loss_box_reg": reg_loss}
        new_stats = dict(mutated.get("batch_stats", batch_stats))
        if self.loss_normalizer_mode == "ema":
            new_stats["loss_normalizer"] = jax.lax.stop_gradient(normalizer)
        return cls_loss + reg_loss, (loss_dict, new_stats)

    # -- inference ------------------------------------------------------------
    def predict_fn(self, variables, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = self.normalize(images)
        logits, bbox_reg = self.module.apply(variables, x, train=False)
        n, h, w, _ = x.shape
        grid_sizes = [(-(-h // s), -(-w // s)) for s in self.strides]
        anchors_per_level = [
            jnp.asarray(a) for a in self.anchor_generator.grid_anchors(grid_sizes)
        ]

        def decode_one(args):
            cls_list, box_list = args
            cand_boxes, cand_scores, cand_classes = [], [], []
            for lg, bx, anc in zip(cls_list, box_list, anchors_per_level):
                scores = jax.nn.sigmoid(lg.reshape(-1).astype(jnp.float32))
                # reference bounds the per-level candidate count by the
                # ANCHOR count, not anchors*classes (retinanet.py:349)
                k = min(self.topk_candidates, int(anc.shape[0]), scores.shape[0])
                top_scores, idx = jax.lax.top_k(scores, k)
                anchor_idx = idx // self.num_classes
                cls_idx = (idx % self.num_classes).astype(jnp.int32)
                deltas = bx.reshape(-1, 4)[anchor_idx]
                boxes = self.box2box.apply_deltas(deltas, anc[anchor_idx])
                keep = top_scores > self.score_threshold
                cand_boxes.append(boxes)
                cand_scores.append(jnp.where(keep, top_scores, -jnp.inf))
                cand_classes.append(cls_idx)
            boxes = jnp.concatenate(cand_boxes, axis=0)
            scores = jnp.concatenate(cand_scores, axis=0)
            classes = jnp.concatenate(cand_classes, axis=0)
            keep_idx, keep_valid = batched_nms_fixed(
                boxes, scores, classes, self.nms_threshold, self.max_detections
            )
            out_scores = jnp.where(keep_valid, scores[keep_idx], 0.0)
            return {
                "boxes": boxes[keep_idx],
                "scores": out_scores,
                "classes": classes[keep_idx],
            }

        per_image = jax.vmap(
            lambda cl, bl: decode_one((list(cl), list(bl)))
        )
        return per_image(tuple(logits), tuple(bbox_reg))

    # -- host boundary --------------------------------------------------------
    def postprocess(self, dets, warps, orig_sizes) -> List[Dict[str, Instances]]:
        boxes = np.asarray(dets["boxes"])
        scores = np.asarray(dets["scores"])
        classes = np.asarray(dets["classes"])
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
            inst.pred_boxes = bx[ne]
            inst.scores = s[ne].astype(np.float32)
            inst.pred_classes = c[ne].astype(np.int64)
            results.append({"instances": inst})
        return results
