"""Region Proposal Network (reference ``detectron2/modeling/proposal_generator/rpn.py``).

``StandardRPNHead`` (:68): shared 3x3 conv + 1x1 objectness + 1x1 deltas per
level.  The ``RPN`` logic (:328: anchor matching, 256-anchor sampling at 0.5
positive fraction, BCE + smooth-L1 losses) and ``find_top_rpn_proposals``
(proposal_utils.py:13-113: per-level pre-NMS top-k, level-wise NMS, global
post-NMS top-k) are pure jnp functions over static shapes: proposal lists are
fixed-size (padded, validity-masked) tensors.
"""

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nms import nms_fixed, pairwise_iou_xyxy
from ..box_regression import Box2BoxTransform
from ..matcher import Matcher

__all__ = ["StandardRPNHead", "subsample_labels", "rpn_losses", "find_top_rpn_proposals"]


class StandardRPNHead(nn.Module):
    """Shared conv + objectness/delta predictors over pyramid levels.

    The hidden conv width follows the INPUT channel count (reference
    rpn.py:92: ``Conv2d(in_channels, in_channels, 3)``) — 256 on FPN
    pyramids but 1024 on the C4 family's single res4 level; ``channels``
    overrides it explicitly."""

    num_anchors: int
    channels: int = 0  # 0 -> match the input feature width
    box_dim: int = 4  # 5 for rotated (RRPN)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        w_init = nn.initializers.normal(0.01)
        conv = nn.Conv(self.channels or features[0].shape[-1], (3, 3),
                       padding="SAME", kernel_init=w_init,
                       dtype=self.dtype, name="conv")
        objectness = nn.Conv(self.num_anchors, (1, 1), kernel_init=w_init,
                             dtype=jnp.float32, name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * self.box_dim, (1, 1), kernel_init=w_init,
                         dtype=jnp.float32, name="anchor_deltas")
        logits, reg = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(objectness(t.astype(jnp.float32)))
            reg.append(deltas(t.astype(jnp.float32)))
        return logits, reg


def subsample_labels(
    labels: jnp.ndarray,  # (R,) in {-1 ignore, 0 neg, 1 pos}
    num_samples: int,
    positive_fraction: float,
    rng: jax.Array,
) -> jnp.ndarray:
    """Static-shape re-design of ``sampling.py:9-55``: instead of gathering a
    variable-size random subset, return a {-1, 0, 1} training mask with at
    most ``num_samples*positive_fraction`` positives and the rest negatives,
    chosen by randomized top-k priorities."""
    r = labels.shape[0]
    k_pos = min(int(num_samples * positive_fraction), r)
    k_neg = min(num_samples, r)  # upper bound; trimmed below

    rand = jax.random.uniform(rng, (r,))
    pos_priority = jnp.where(labels == 1, rand, -1.0)
    _, pos_idx = jax.lax.top_k(pos_priority, k_pos)
    pos_take = jnp.zeros((r,), bool).at[pos_idx].set(True) & (labels == 1)
    num_pos = pos_take.sum()

    neg_priority = jnp.where(labels == 0, rand, -1.0)
    _, neg_idx = jax.lax.top_k(neg_priority, k_neg)
    # rank negatives; keep the first (num_samples - num_pos)
    neg_rank = jnp.zeros((r,), jnp.int32).at[neg_idx].set(
        jax.lax.broadcasted_iota(jnp.int32, (k_neg, 1), 0).squeeze(-1)
    )
    neg_take = (
        jnp.zeros((r,), bool).at[neg_idx].set(True)
        & (labels == 0)
        & (neg_rank < (num_samples - num_pos))
    )
    return jnp.where(pos_take, 1, jnp.where(neg_take, 0, -1)).astype(jnp.int8)


def rpn_losses(
    anchors: jnp.ndarray,  # (R, 4)
    pred_logits: jnp.ndarray,  # (N, R)
    pred_deltas: jnp.ndarray,  # (N, R, 4)
    gt_boxes: jnp.ndarray,  # (N, M, 4)
    gt_valid: jnp.ndarray,  # (N, M)
    rng: jax.Array,
    matcher: Matcher,
    box2box: Box2BoxTransform,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    smooth_l1_beta: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Reference RPN.losses (rpn.py:404-440), vectorized over the batch."""
    n = pred_logits.shape[0]

    def per_image(rng_i, boxes_i, valid_i):
        iou = pairwise_iou_xyxy(boxes_i, anchors)
        matches, labels = matcher(iou, valid_i)
        labels = subsample_labels(
            labels.astype(jnp.int32), batch_size_per_image, positive_fraction, rng_i
        )
        matched = boxes_i[matches]
        return labels, matched

    rngs = jax.random.split(rng, n)
    labels, matched = jax.vmap(per_image)(rngs, gt_boxes, gt_valid)  # (N, R)

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


def find_top_rpn_proposals(
    logits_per_level: Sequence[jnp.ndarray],  # each (N, Rl)
    deltas_per_level: Sequence[jnp.ndarray],  # each (N, Rl, 4)
    anchors_per_level: Sequence[jnp.ndarray],  # each (Rl, 4)
    image_hw: Tuple[int, int],
    box2box: Box2BoxTransform,
    nms_thresh: float = 0.7,
    pre_nms_topk: int = 1000,
    post_nms_topk: int = 1000,
    min_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-size proposal selection (reference proposal_utils.py:13-113).

    Returns (boxes (N, P, 4), scores (N, P), valid (N, P)) with
    P = post_nms_topk.  NMS runs per level (reference semantics), then the
    global top-P by score is taken.
    """
    h, w = image_hw
    n = logits_per_level[0].shape[0]

    def per_image(args):
        logits_list, deltas_list = args
        all_boxes, all_scores = [], []
        for lg, dl, anc in zip(logits_list, deltas_list, anchors_per_level):
            k = min(pre_nms_topk, lg.shape[0])
            scores, idx = jax.lax.top_k(lg, k)
            boxes = box2box.apply_deltas(dl[idx], anc[idx])
            # clip to image
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[:, 0], 0, w),
                    jnp.clip(boxes[:, 1], 0, h),
                    jnp.clip(boxes[:, 2], 0, w),
                    jnp.clip(boxes[:, 3], 0, h),
                ],
                axis=1,
            )
            too_small = (
                (boxes[:, 2] - boxes[:, 0] < min_size)
                | (boxes[:, 3] - boxes[:, 1] < min_size)
            )
            scores = jnp.where(too_small, -jnp.inf, scores)
            keep_k = min(post_nms_topk, k)
            keep, valid = nms_fixed(boxes, scores, nms_thresh, keep_k)
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
