"""ROI-heads logic as pure jnp functions over static shapes.

Reference: ``detectron2/modeling/roi_heads/roi_heads.py`` —
``label_and_sample_proposals`` (:123-343, matching + 512-sample at 0.25 pos
fraction with gt appended), and ``fast_rcnn.py`` — softmax CE + smooth-L1
losses (:46-300) and per-class-NMS inference (:302-370).

Static redesign: proposals are fixed-P tensors with validity masks; sampling
returns a fixed-S slot tensor (selected proposal indices + per-slot labels);
inference emits fixed-K detections.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...ops.nms import batched_nms_fixed, pairwise_iou_xyxy
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher
from ..proposal_generator.rpn import subsample_labels

__all__ = ["label_and_sample_proposals", "fast_rcnn_losses", "fast_rcnn_inference"]


def label_and_sample_proposals(
    proposals: jnp.ndarray,  # (P, 4)
    proposal_valid: jnp.ndarray,  # (P,)
    gt_boxes: jnp.ndarray,  # (M, 4)
    gt_classes: jnp.ndarray,  # (M,)
    gt_valid: jnp.ndarray,  # (M,)
    rng: jax.Array,
    matcher: Matcher,
    num_samples: int = 512,
    positive_fraction: float = 0.25,
    num_classes: int = 80,
    append_gt: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Returns fixed-S sampled training rois:
      boxes (S, 4), classes (S,) in [0..C] (C = background), weights (S,)
      {0 = padding}, target_boxes (S, 4) matched gt for the positives.
    """
    if append_gt:
        proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
        proposal_valid = jnp.concatenate([proposal_valid, gt_valid], axis=0)
    if proposals.shape[0] < num_samples:
        pad = num_samples - proposals.shape[0]
        proposals = jnp.concatenate([proposals, jnp.zeros((pad, 4), proposals.dtype)], 0)
        proposal_valid = jnp.concatenate([proposal_valid, jnp.zeros((pad,), bool)], 0)

    iou = pairwise_iou_xyxy(gt_boxes, proposals)
    iou = jnp.where(proposal_valid[None, :], iou, -1.0)
    matches, labels = matcher(iou, gt_valid)  # labels in {0 neg, 1 pos} (no ignore for ROI matcher)
    labels = jnp.where(proposal_valid, labels.astype(jnp.int32), -1)
    rng_sub, rng_tie = jax.random.split(rng)
    sel = subsample_labels(labels, num_samples, positive_fraction, rng_sub)  # (P+M,)

    # gather the sampled slots into fixed S entries: positives first
    priority = jnp.where(sel == 1, 2.0, jnp.where(sel == 0, 1.0, 0.0))
    priority = priority + jax.random.uniform(rng_tie, priority.shape) * 1e-3
    _, idx = jax.lax.top_k(priority, num_samples)  # (S,)
    sel_s = sel[idx]
    boxes = proposals[idx]
    matched = matches[idx]
    cls = jnp.where(
        sel_s == 1,
        gt_classes[matched].astype(jnp.int32),
        num_classes,  # background
    )
    weights = (sel_s >= 0).astype(jnp.float32)
    target_boxes = gt_boxes[matched]
    return {
        "boxes": boxes,
        "classes": cls,
        "weights": weights,
        "target_boxes": target_boxes,
        "matched_idx": matched,
        "is_pos": sel_s == 1,
    }


def fast_rcnn_losses(
    scores: jnp.ndarray,  # (S, C+1)
    deltas: jnp.ndarray,  # (S, 4C) or (S, 4)
    sampled: Dict[str, jnp.ndarray],
    box2box: Box2BoxTransform,
    num_classes: int,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Softmax CE over sampled rois + smooth-L1 on foreground
    (reference fast_rcnn.py:201-260)."""
    cls = sampled["classes"]
    w = sampled["weights"]
    num_valid = jnp.maximum(w.sum(), 1.0)

    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, cls[:, None], axis=1)[:, 0]
    loss_cls = (ce * w).sum() / num_valid

    gt_deltas = box2box.get_deltas(sampled["boxes"], sampled["target_boxes"])
    if deltas.shape[-1] == 4:
        pred = deltas
    else:
        d = deltas.reshape(deltas.shape[0], num_classes, 4)
        fg_cls = jnp.clip(cls, 0, num_classes - 1)
        pred = jnp.take_along_axis(d, fg_cls[:, None, None], axis=1)[:, 0]
    diff = jnp.abs(pred - gt_deltas)
    if smooth_l1_beta > 0:
        reg = jnp.where(diff < smooth_l1_beta, 0.5 * diff * diff / smooth_l1_beta,
                        diff - 0.5 * smooth_l1_beta)
    else:
        reg = diff
    pos_w = (sampled["is_pos"] & (w > 0)).astype(jnp.float32)
    loss_box = (reg.sum(-1) * pos_w).sum() / num_valid
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box}


def fast_rcnn_inference(
    proposals: jnp.ndarray,  # (P, 4)
    proposal_valid: jnp.ndarray,  # (P,)
    scores: jnp.ndarray,  # (P, C+1)
    deltas: jnp.ndarray,  # (P, 4C) or (P, 4)
    box2box: Box2BoxTransform,
    num_classes: int,
    image_hw: Tuple[int, int],
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    topk_per_image: int = 100,
) -> Dict[str, jnp.ndarray]:
    """Per-class decode + NMS to fixed K slots (reference fast_rcnn.py:302-370)."""
    h, w = image_hw
    probs = jax.nn.softmax(scores, axis=-1)[:, :num_classes]  # (P, C)
    if deltas.shape[-1] == 4:
        boxes_all = box2box.apply_deltas(deltas, proposals)  # (P, 4)
        boxes_pc = jnp.broadcast_to(boxes_all[:, None, :], probs.shape + (4,))
    else:
        d = deltas.reshape(deltas.shape[0], num_classes, 4)
        boxes_pc = jax.vmap(
            lambda dd, bb: box2box.apply_deltas(dd, jnp.broadcast_to(bb, (num_classes, 4))),
        )(d, proposals)  # (P, C, 4)
    boxes_pc = jnp.stack(
        [
            jnp.clip(boxes_pc[..., 0], 0, w),
            jnp.clip(boxes_pc[..., 1], 0, h),
            jnp.clip(boxes_pc[..., 2], 0, w),
            jnp.clip(boxes_pc[..., 3], 0, h),
        ],
        axis=-1,
    )
    p, c = probs.shape
    flat_scores = jnp.where(
        proposal_valid[:, None] & (probs > score_thresh), probs, -jnp.inf
    ).reshape(p * c)
    flat_boxes = boxes_pc.reshape(p * c, 4)
    flat_classes = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, (p, c), 1), (p, c)
    ).reshape(p * c)
    keep, valid = batched_nms_fixed(
        flat_boxes, flat_scores, flat_classes, nms_thresh, topk_per_image
    )
    return {
        "boxes": flat_boxes[keep],
        "scores": jnp.where(valid, flat_scores[keep], 0.0),
        "classes": flat_classes[keep],
    }
