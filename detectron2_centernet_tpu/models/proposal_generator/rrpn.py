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

__all__ = ["rrpn_losses", "find_top_rrpn_proposals"]


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
            # keep centers inside the image (the rotated analog of clipping)
            inside = (
                (boxes[:, 0] >= 0) & (boxes[:, 0] < w)
                & (boxes[:, 1] >= 0) & (boxes[:, 1] < h)
            )
            scores = jnp.where(inside, scores, -jnp.inf)
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
