"""Rotated RPN (reference ``detectron2/modeling/proposal_generator/rrpn.py``).

Same structure as ``rpn.py`` with 5-parameter rotated boxes: matching uses
the exact on-device rotated IoU, deltas are ``Box2BoxTransformRotated``, and
proposal selection ends in fixed-K rotated NMS.
"""

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.roi_align_rotated import nms_rotated_fixed, pairwise_iou_rotated_jnp
from ..box_regression import Box2BoxTransformRotated
from ..matcher import Matcher
from .rpn import subsample_labels

__all__ = [
    "rrpn_losses",
    "find_top_rrpn_proposals",
    "normalize_angles",
    "clip_rotated_boxes",
]


def normalize_angles(boxes: jnp.ndarray) -> jnp.ndarray:
    """Restrict box angles to [-180, 180) degrees (reference
    structures/rotated_boxes.py:246-250)."""
    a = (boxes[..., 4] + 180.0) % 360.0 - 180.0
    return jnp.concatenate([boxes[..., :4], a[..., None]], axis=-1)


def clip_rotated_boxes(
    boxes: jnp.ndarray, image_hw: Tuple[int, int], clip_angle_threshold: float = 1.0
) -> jnp.ndarray:
    """``RotatedBoxes.clip`` (reference structures/rotated_boxes.py:252-300):
    normalize angles, then clip only near-horizontal boxes
    (|angle| <= threshold) as axis-aligned rectangles; steeper boxes pass
    through untouched (RoIAlignRotated handles out-of-image sampling)."""
    h, w = image_hw
    boxes = normalize_angles(boxes)
    cx, cy, bw, bh, a = [boxes[..., i] for i in range(5)]
    x1 = jnp.clip(cx - bw / 2.0, 0, w)
    y1 = jnp.clip(cy - bh / 2.0, 0, h)
    x2 = jnp.clip(cx + bw / 2.0, 0, w)
    y2 = jnp.clip(cy + bh / 2.0, 0, h)
    near_h = jnp.abs(a) <= clip_angle_threshold
    out = jnp.stack(
        [
            jnp.where(near_h, (x1 + x2) / 2.0, cx),
            jnp.where(near_h, (y1 + y2) / 2.0, cy),
            jnp.where(near_h, jnp.minimum(bw, x2 - x1), bw),
            jnp.where(near_h, jnp.minimum(bh, y2 - y1), bh),
            a,
        ],
        axis=-1,
    )
    return out


def rrpn_losses(
    anchors: jnp.ndarray,  # (R, 5)
    pred_logits: jnp.ndarray,  # (N, R)
    pred_deltas: jnp.ndarray,  # (N, R, 5)
    gt_boxes: jnp.ndarray,  # (N, M, 5)
    gt_valid: jnp.ndarray,  # (N, M)
    rng: jax.Array,
    matcher: Matcher,
    box2box: Box2BoxTransformRotated,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    n = pred_logits.shape[0]

    def per_image(rng_i, boxes_i, valid_i):
        iou = pairwise_iou_rotated_jnp(boxes_i, anchors)  # (M, R)
        matches, labels = matcher(iou, valid_i)
        labels = subsample_labels(
            labels.astype(jnp.int32), batch_size_per_image, positive_fraction, rng_i
        )
        return labels, boxes_i[matches]

    rngs = jax.random.split(rng, n)
    labels, matched = jax.vmap(per_image)(rngs, gt_boxes, gt_valid)

    pos = labels == 1
    valid = labels >= 0
    normalizer = batch_size_per_image * n

    gt_deltas = box2box.get_deltas(anchors[None], matched)
    diff = jnp.abs(pred_deltas - gt_deltas)
    if smooth_l1_beta > 0:
        reg = jnp.where(diff < smooth_l1_beta, 0.5 * diff * diff / smooth_l1_beta,
                        diff - 0.5 * smooth_l1_beta)
    else:
        reg = diff
    loss_loc = jnp.where(pos[..., None], reg, 0.0).sum() / normalizer

    labels_f = pos.astype(jnp.float32)
    ce = jnp.maximum(pred_logits, 0) - pred_logits * labels_f + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )
    loss_cls = jnp.where(valid, ce, 0.0).sum() / normalizer
    return {"loss_rpn_cls": loss_cls, "loss_rpn_loc": loss_loc}


def find_top_rrpn_proposals(
    logits_per_level: Sequence[jnp.ndarray],  # each (N, Rl)
    deltas_per_level: Sequence[jnp.ndarray],  # each (N, Rl, 5)
    anchors_per_level: Sequence[jnp.ndarray],  # each (Rl, 5)
    image_hw: Tuple[int, int],
    box2box: Box2BoxTransformRotated,
    nms_thresh: float = 0.7,
    pre_nms_topk: int = 1000,
    post_nms_topk: int = 1000,
    min_box_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(boxes (N, P, 5), scores (N, P), valid (N, P))."""
    h, w = image_hw

    def per_image(args):
        logits_list, deltas_list = args
        all_boxes, all_scores = [], []
        for lg, dl, anc in zip(logits_list, deltas_list, anchors_per_level):
            k = min(pre_nms_topk, lg.shape[0])
            scores, idx = jax.lax.top_k(lg, k)
            boxes = box2box.apply_deltas(dl[idx], anc[idx])
            # reference rrpn.py:92-105: clip near-horizontal boxes to the
            # image, then drop empty boxes (side <= min_box_size)
            boxes = clip_rotated_boxes(boxes, (h, w))
            nonempty = (boxes[:, 2] > min_box_size) & (boxes[:, 3] > min_box_size)
            scores = jnp.where(nonempty, scores, -jnp.inf)
            # per-level NMS capped at post_nms_topk survivors: the reference
            # NMS-es the level union batched by level id and then takes a
            # global post_nms_topk — identical to per-level NMS because
            # cross-level boxes never suppress each other, and the per-level
            # cap can't change a global top-(post_nms_topk) selection
            keep_k = min(post_nms_topk, k)
            keep, valid = nms_rotated_fixed(boxes, scores, nms_thresh, keep_k)
            all_boxes.append(boxes[keep])
            all_scores.append(jnp.where(valid, scores[keep], -jnp.inf))
        boxes = jnp.concatenate(all_boxes, axis=0)
        scores = jnp.concatenate(all_scores, axis=0)
        k_out = min(post_nms_topk, scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, k_out)
        return boxes[top_idx], top_scores, jnp.isfinite(top_scores)

    return jax.vmap(lambda lg, dl: per_image((list(lg), list(dl))))(
        tuple(logits_per_level), tuple(deltas_per_level)
    )
