"""ROIAlignRotated (reference ``detectron2/layers/csrc/ROIAlignRotated/*``,
~1k LoC C++/CUDA): ROIAlign where the sampling grid is rotated by each box's
angle.  Same gather formulation as ``ops/roi_align.py`` — the grid is rotated
in closed form before the batched gather, so the op stays one fused XLA
program.  Also provides a vectorized on-device rotated IoU
(``pairwise_iou_rotated_jnp``) for rotated matching/NMS inside jitted steps.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .roi_align import _bilinear_sample

__all__ = ["roi_align_rotated", "pairwise_iou_rotated_jnp", "nms_rotated_fixed"]


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated(
    features: jnp.ndarray,  # (N, H, W, C)
    boxes: jnp.ndarray,  # (R, 5): cx, cy, w, h, angle_deg (ccw)
    batch_idx: jnp.ndarray,  # (R,)
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """(R, P, P, C) pooled features from rotated rois (aligned=true model)."""
    p, s = output_size, sampling_ratio
    b = boxes.astype(jnp.float32)
    cx = b[:, 0] * spatial_scale - 0.5
    cy = b[:, 1] * spatial_scale - 0.5
    roi_w = jnp.maximum(b[:, 2] * spatial_scale, 1e-6)
    roi_h = jnp.maximum(b[:, 3] * spatial_scale, 1e-6)
    theta = -b[:, 4] * jnp.pi / 180.0  # reference rotates by -angle
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    # unrotated sample offsets from the roi center: (P*S,) in each axis
    grid = (jnp.arange(p * s) + 0.5) / (p * s)  # uniform over the roi
    ux = (grid - 0.5)[None, :] * roi_w[:, None]  # (R, PS)
    uy = (grid - 0.5)[None, :] * roi_h[:, None]

    # rotate: x' = cx + ux*cos - uy*sin ; y' = cy + ux*sin + uy*cos
    xs = cx[:, None, None] + ux[:, None, :] * cos[:, None, None] - uy[:, :, None] * sin[:, None, None]
    ys = cy[:, None, None] + ux[:, None, :] * sin[:, None, None] + uy[:, :, None] * cos[:, None, None]
    # (R, PS, PS): rows = y index, cols = x index

    def one_roi(bi, ys_r, xs_r):
        samples = _bilinear_sample(features[bi], ys_r, xs_r)  # (PS, PS, C)
        c = samples.shape[-1]
        return samples.reshape(p, s, p, s, c).mean(axis=(1, 3))

    return jax.vmap(one_roi)(batch_idx, ys, xs)


def _box_vertices_jnp(boxes: jnp.ndarray) -> jnp.ndarray:
    """(.., 5) -> (.., 4, 2) corners, ccw."""
    cx, cy, w, h, a = [boxes[..., i] for i in range(5)]
    t = jnp.deg2rad(a)
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([w, -w, -w, w], -1) / 2
    dy = jnp.stack([h, h, -h, -h], -1) / 2
    x = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    y = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([x, y], -1)


def _clip_convex(poly, valid_n, ax, ay, bx, by, max_v):
    """Sutherland–Hodgman step with fixed-capacity vertex buffers.

    poly (V, 2) with ``valid_n`` live vertices -> clipped against the
    half-plane left of (a->b). Returns (new_poly (2V, 2), new_n).
    """
    v = poly.shape[0]
    ex, ey = bx - ax, by - ay

    idx = jnp.arange(v)
    nxt = jnp.where(idx + 1 >= valid_n, 0, idx + 1)
    cur = poly
    nxt_p = poly[nxt]

    def side(pt):
        return ex * (pt[..., 1] - ay) - ey * (pt[..., 0] - ax)

    s_cur = side(cur)
    s_nxt = side(nxt_p)
    cur_in = s_cur >= -1e-9
    nxt_in = s_nxt >= -1e-9
    denom = s_cur - s_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = cur + t[..., None] * (nxt_p - cur)

    live = idx < valid_n
    # per input edge: emit up to 2 points: the current vertex (if inside) and
    # the intersection (if the edge crosses)
    emit_cur = cur_in & live
    emit_int = (cur_in != nxt_in) & live
    out = jnp.zeros((2 * v, 2), poly.dtype)
    flags = jnp.zeros((2 * v,), bool)
    out = out.at[0::2].set(cur).at[1::2].set(inter)
    flags = flags.at[0::2].set(emit_cur).at[1::2].set(emit_int)
    # compact: stable sort by (not flag) so live vertices lead, order kept
    order = jnp.argsort(~flags, stable=True)
    return out[order], flags.sum()


def _poly_area(poly, n):
    v = poly.shape[0]
    idx = jnp.arange(v)
    nxt = jnp.where(idx + 1 >= n, 0, idx + 1)
    live = (idx < n).astype(poly.dtype)
    x, y = poly[:, 0], poly[:, 1]
    xn, yn = x[nxt], y[nxt]
    return 0.5 * jnp.abs(jnp.sum((x * yn - xn * y) * live))


def _pair_iou_rot(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (5,) rotated box vs one (5,) rotated box (jnp scalar)."""
    v1 = _box_vertices_jnp(b1)  # (4, 2)
    v2 = _box_vertices_jnp(b2)
    poly = jnp.zeros((64, 2), b1.dtype).at[:4].set(v1)
    n = jnp.asarray(4)

    def clip_edge(i, state):
        poly, n = state
        a = v2[i]
        b = v2[(i + 1) % 4]
        new_poly, new_n = _clip_convex(poly, n, a[0], a[1], b[0], b[1], 64)
        return new_poly[:64], jnp.minimum(new_n, 64)

    poly, n = jax.lax.fori_loop(0, 4, clip_edge, (poly, n))
    inter = _poly_area(poly, n)
    a1 = b1[2] * b1[3]
    a2 = b2[2] * b2[3]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def pairwise_iou_rotated_jnp(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) exact rotated IoU, fully vectorized
    (fixed-capacity polygon clipping — usable inside jitted train steps)."""
    f = jax.vmap(jax.vmap(_pair_iou_rot, in_axes=(None, 0)), in_axes=(0, None))
    return f(boxes1.astype(jnp.float32), boxes2.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("max_out",))
def nms_rotated_fixed(
    boxes: jnp.ndarray,  # (C, 5)
    scores: jnp.ndarray,  # (C,)
    iou_threshold: float,
    max_out: int = 100,
    classes: jnp.ndarray = None,  # optional (C,) int — per-class suppression
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-K greedy rotated NMS (device analog of csrc/nms_rotated).

    With ``classes`` given, suppression only applies within a class —
    the reference's ``batched_nms_rotated`` semantics
    (layers/nms.py:34, rotated_fast_rcnn.py), expressed as a same-class
    mask instead of the coordinate-offset trick (exact in f32)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, state):
        live, keep, valid = state
        j = jnp.argmax(live)
        ok = live[j] > neg_inf
        keep = keep.at[i].set(j.astype(jnp.int32))
        valid = valid.at[i].set(ok)
        iou = jax.vmap(lambda b: _pair_iou_rot(boxes[j], b))(boxes)
        suppress = (iou > iou_threshold) & ok
        if classes is not None:
            suppress = suppress & (classes == classes[j])
        live = jnp.where(suppress, neg_inf, live)
        live = live.at[j].set(neg_inf)
        return live, keep, valid

    keep = jnp.zeros((max_out,), jnp.int32)
    valid = jnp.zeros((max_out,), bool)
    _, keep, valid = jax.lax.fori_loop(0, max_out, body, (scores, keep, valid))
    return keep, valid
