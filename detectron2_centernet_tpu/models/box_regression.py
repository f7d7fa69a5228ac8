"""Box delta transforms (reference ``detectron2/modeling/box_regression.py``).

``Box2BoxTransform`` (:16): (dx, dy, dw, dh) deltas between source boxes and
target boxes, weighted, with the dw/dh clamp at log(1000/16) on decode.
Pure jnp functions usable inside jitted train/predict steps.
"""

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = ["Box2BoxTransform", "Box2BoxTransformRotated"]

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


class Box2BoxTransform:
    def __init__(self, weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0), scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """XYXY (..., 4) -> weighted deltas (..., 4) (reference :40-76)."""
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        eps = 1e-8
        dx = wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps)
        dy = wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps)
        dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps))
        dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps))
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """deltas (..., k*4) applied to boxes (..., 4) -> (..., k*4)
        (reference :78-113)."""
        boxes = boxes.astype(deltas.dtype)
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        shape = deltas.shape
        d = deltas.reshape(shape[:-1] + (-1, 4))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]
        out = jnp.stack(
            [
                pred_ctr_x - 0.5 * pred_w,
                pred_ctr_y - 0.5 * pred_h,
                pred_ctr_x + 0.5 * pred_w,
                pred_ctr_y + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(shape)


class Box2BoxTransformRotated:
    """5-param (dx, dy, dw, dh, da) deltas for rotated boxes
    (reference box_regression.py:114-212); angles in degrees, da normalized
    to (-180, 180]."""

    def __init__(self, weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
                 scale_clamp: float = _DEFAULT_SCALE_CLAMP):
        self.weights = tuple(weights)
        self.scale_clamp = scale_clamp

    def get_deltas(self, src: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        wx, wy, ww, wh, wa = self.weights
        eps = 1e-8
        dx = wx * (target[..., 0] - src[..., 0]) / jnp.maximum(src[..., 2], eps)
        dy = wy * (target[..., 1] - src[..., 1]) / jnp.maximum(src[..., 3], eps)
        dw = ww * jnp.log(jnp.maximum(target[..., 2], eps) / jnp.maximum(src[..., 2], eps))
        dh = wh * jnp.log(jnp.maximum(target[..., 3], eps) / jnp.maximum(src[..., 3], eps))
        da = target[..., 4] - src[..., 4]
        da = (da + 180.0) % 360.0 - 180.0
        return jnp.stack([dx, dy, dw, dh, wa * da * jnp.pi / 180.0], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        wx, wy, ww, wh, wa = self.weights
        boxes = boxes.astype(deltas.dtype)
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3] / wh, self.scale_clamp)
        da = deltas[..., 4] * 180.0 / jnp.pi / wa
        cx = dx * boxes[..., 2] + boxes[..., 0]
        cy = dy * boxes[..., 3] + boxes[..., 1]
        w = jnp.exp(dw) * boxes[..., 2]
        h = jnp.exp(dh) * boxes[..., 3]
        a = (boxes[..., 4] + da + 180.0) % 360.0 - 180.0
        return jnp.stack([cx, cy, w, h, a], axis=-1)
