"""Fixed-shape non-maximum suppression for XLA.

The reference uses torchvision's CUDA NMS via ``batched_nms``
(``detectron2/layers/nms.py:10-31``, class-offset trick).  On TPU, dynamic
output sizes don't compile, so NMS is expressed as a fixed-K greedy loop:
``lax.fori_loop`` selects the top remaining box K times, suppressing
overlaps after each pick.  Cost is K * C IoU evaluations — pure VPU work,
independent of how many boxes survive, and fully fusable into the
surrounding program.

Outputs are always K slots + a validity mask; consumers threshold on the
mask at the host boundary (the framework-wide static-shape convention).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["nms_fixed", "batched_nms_fixed", "pairwise_iou_xyxy"]


def pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU between (N, 4) and (M, 4) XYXY boxes -> (N, M)."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def _iou_one_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (C, 4)."""
    area1 = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + areas - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_fixed(
    boxes: jnp.ndarray,  # (C, 4) XYXY
    scores: jnp.ndarray,  # (C,)  (-inf marks invalid candidates)
    iou_threshold: float,
    max_out: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS. Returns (keep_idx (K,) int32, keep_valid (K,) bool)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, state):
        live, keep, valid = state
        j = jnp.argmax(live)
        smax = live[j]
        ok = smax > neg_inf
        keep = keep.at[i].set(j.astype(jnp.int32))
        valid = valid.at[i].set(ok)
        iou = _iou_one_many(boxes[j], boxes)
        suppress = (iou > iou_threshold) & ok
        live = jnp.where(suppress, neg_inf, live)
        live = live.at[j].set(neg_inf)
        return live, keep, valid

    keep = jnp.zeros((max_out,), jnp.int32)
    valid = jnp.zeros((max_out,), bool)
    _, keep, valid = jax.lax.fori_loop(0, max_out, body, (scores, keep, valid))
    return keep, valid


@functools.partial(jax.jit, static_argnames=("max_out",))
def batched_nms_fixed(
    boxes: jnp.ndarray,  # (C, 4)
    scores: jnp.ndarray,  # (C,)
    classes: jnp.ndarray,  # (C,) int
    iou_threshold: float,
    max_out: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware NMS via the coordinate-offset trick
    (reference layers/nms.py:10-31)."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype)[:, None] * max_coord
    return nms_fixed(boxes + offsets, scores, iou_threshold, max_out)
