"""Mask head (reference ``detectron2/modeling/roi_heads/mask_head.py``).

``MaskRCNNConvUpsampleHead`` (:207): 4x [3x3 conv + relu] → 2x deconv →
1x1 per-class mask logits.  ``mask_rcnn_loss`` (:32) is BCE between the
predicted mask at the gt class and the gt mask cropped to the proposal box;
``mask_rcnn_inference`` (:114) takes the sigmoid mask at the predicted class.

TPU target plumbing: gt masks arrive as fixed ``(M, R, R)`` rasters in
gt-box-relative coordinates (structures/masks.py ``rasterize_in_box``, built
once in the mapper).  ``crop_gt_masks`` bilinear-samples the proposal-box
window from the matched gt raster on device — replacing the reference's
per-iteration host rasterization of polygons inside ``mask_rcnn_loss``
(mask_head.py:70-84)."""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MaskRCNNConvUpsampleHead", "CoarseMaskHead", "crop_gt_masks", "mask_rcnn_loss"]


class MaskRCNNConvUpsampleHead(nn.Module):
    num_classes: int
    num_conv: int = 4
    conv_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(R, P, P, C) pooled -> (R, 2P, 2P, num_classes) mask logits."""
        w_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding="SAME", kernel_init=w_init,
                        dtype=self.dtype, name=f"mask_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.conv_dim, (2, 2), strides=(2, 2), kernel_init=w_init,
                             dtype=self.dtype, name="deconv")(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), kernel_init=nn.initializers.normal(0.001),
                       dtype=jnp.float32, name="predictor")(x.astype(jnp.float32))


class CoarseMaskHead(nn.Module):
    """FC-based coarse mask head (reference projects/PointRend/point_rend/
    coarse_mask_head.py:12-92): reduce channels (1x1) and spatial dims
    (2x2 s2), then FC layers predict a low-res per-class mask — the coarse
    stage PointRend refines with its point head."""

    num_classes: int
    conv_dim: int = 256
    fc_dim: int = 1024
    num_fc: int = 2
    output_side: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(R, P, P, Cin) pooled -> (R, out, out, num_classes) logits."""
        r, p, _, cin = x.shape
        if cin > self.conv_dim:
            x = nn.relu(
                nn.Conv(self.conv_dim, (1, 1), dtype=self.dtype,
                        name="reduce_channel_dim_conv")(x)
            )
        x = nn.relu(
            nn.Conv(self.conv_dim, (2, 2), strides=2, dtype=self.dtype,
                    name="reduce_spatial_dim_conv")(x)
        )
        x = x.reshape(r, -1).astype(jnp.float32)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"coarse_mask_fc{i + 1}")(x))
        x = nn.Dense(
            self.num_classes * self.output_side ** 2,
            kernel_init=nn.initializers.normal(0.001),
            name="prediction",
        )(x)
        # (class, y, x)-major flat ordering, matching the reference's
        # .view(N, C, side, side) so imported torch prediction weights
        # wire correctly; the transpose folds away under XLA
        return x.reshape(
            r, self.num_classes, self.output_side, self.output_side
        ).transpose(0, 2, 3, 1)


def crop_gt_masks(
    gt_rasters: jnp.ndarray,  # (M, R, R) float 0/1, gt-box-relative
    gt_boxes: jnp.ndarray,  # (M, 4) XYXY
    matched_idx: jnp.ndarray,  # (S,) gt index per sampled roi
    roi_boxes: jnp.ndarray,  # (S, 4) proposal boxes
    mask_size: int,
) -> jnp.ndarray:
    """(S, mask_size, mask_size) gt mask targets: sample the proposal-box
    window out of the matched gt raster (bilinear, zero outside)."""
    r = gt_rasters.shape[-1]

    def one(m_idx, roi):
        raster = gt_rasters[m_idx]
        gb = gt_boxes[m_idx]
        gw = jnp.maximum(gb[2] - gb[0], 1e-2)
        gh = jnp.maximum(gb[3] - gb[1], 1e-2)
        # proposal-box sample grid in gt-raster coords
        xs = (jnp.linspace(roi[0], roi[2], mask_size) - gb[0]) * (r / gw) - 0.5
        ys = (jnp.linspace(roi[1], roi[3], mask_size) - gb[1]) * (r / gh) - 0.5
        x0 = jnp.floor(xs)
        y0 = jnp.floor(ys)
        out = jnp.zeros((mask_size, mask_size), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                yy = y0 + dy
                xx = x0 + dx
                wy = 1.0 - jnp.abs(ys - yy)
                wx = 1.0 - jnp.abs(xs - xx)
                vy = (yy >= 0) & (yy < r)
                vx = (xx >= 0) & (xx < r)
                yi = jnp.clip(yy, 0, r - 1).astype(jnp.int32)
                xi = jnp.clip(xx, 0, r - 1).astype(jnp.int32)
                vals = raster[yi][:, xi]  # (mask, mask)
                w = (wy * vy)[:, None] * (wx * vx)[None, :]
                out = out + vals * w
        return out

    return jax.vmap(one)(matched_idx, roi_boxes)


def mask_rcnn_loss(
    mask_logits: jnp.ndarray,  # (S, P2, P2, C)
    gt_masks: jnp.ndarray,  # (S, P2, P2)
    classes: jnp.ndarray,  # (S,) gt class per roi
    fg_weights: jnp.ndarray,  # (S,) 1 for foreground sampled rois
) -> jnp.ndarray:
    """BCE at the gt class channel over foreground rois (reference :32-111)."""
    s, p, _, c = mask_logits.shape
    cls = jnp.clip(classes, 0, c - 1)
    logits = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=3
    )[..., 0]  # (S, P2, P2)
    targets = (gt_masks > 0.5).astype(jnp.float32)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_roi = ce.mean(axis=(1, 2))
    num_fg = jnp.maximum(fg_weights.sum(), 1.0)
    return (per_roi * fg_weights).sum() / num_fg
