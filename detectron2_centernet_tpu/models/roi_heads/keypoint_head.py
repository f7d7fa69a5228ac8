"""Keypoint head (reference ``detectron2/modeling/roi_heads/keypoint_head.py``).

``KRCNNConvDeconvUpsampleHead`` (:215): 8x [3x3 conv(512) + relu] → deconv →
2x bilinear upsample → K keypoint heatmaps.  ``keypoint_rcnn_loss`` (:40):
softmax CE over heatmap positions at visible keypoints, normalized by the
visible count; ``keypoint_rcnn_inference`` returns per-roi heatmaps for the
host-side ``heatmaps_to_keypoints`` decode (structures/keypoints.py).
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["KRCNNConvDeconvUpsampleHead", "keypoint_rcnn_loss", "encode_keypoint_targets"]


def encode_keypoint_targets(
    keypoints: jnp.ndarray,  # (S, K, 3) x, y, vis — matched gt keypoints
    rois: jnp.ndarray,  # (S, 4)
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp version of ``structures.keypoints.keypoints_to_heatmap_targets``
    (reference keypoints.py:85-142) for use inside the jitted train step.
    Returns (indices (S, K) int32, valid (S, K) float)."""
    x = keypoints[..., 0]
    y = keypoints[..., 1]
    vis = keypoints[..., 2] > 0
    x0 = rois[:, 0:1]
    y0 = rois[:, 1:2]
    sx = heatmap_size / jnp.maximum(rois[:, 2:3] - rois[:, 0:1], 1e-6)
    sy = heatmap_size / jnp.maximum(rois[:, 3:4] - rois[:, 1:2], 1e-6)
    hx = (x - x0) * sx
    hy = (y - y0) * sy
    hx_i = jnp.where(hx == heatmap_size, heatmap_size - 1, jnp.floor(hx))
    hy_i = jnp.where(hy == heatmap_size, heatmap_size - 1, jnp.floor(hy))
    valid_loc = (hx_i >= 0) & (hy_i >= 0) & (hx_i < heatmap_size) & (hy_i < heatmap_size)
    valid = (valid_loc & vis).astype(jnp.float32)
    idx = (hy_i * heatmap_size + hx_i).astype(jnp.int32)
    return jnp.where(valid > 0, idx, 0), valid


class KRCNNConvDeconvUpsampleHead(nn.Module):
    num_keypoints: int = 17
    conv_dims: Tuple[int, ...] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(R, P, P, C) pooled -> (R, 4P, 4P, K) keypoint logits."""
        w_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i, d in enumerate(self.conv_dims):
            x = nn.Conv(d, (3, 3), padding="SAME", kernel_init=w_init,
                        dtype=self.dtype, name=f"conv_fcn{i + 1}")(x)
            x = nn.relu(x)
        # torch ConvTranspose2d(k=4, s=2, p=1) equivalence: flax padding
        # k-1-p = 2 per side with transpose_kernel=True (same convention as
        # ResNetDeconv / DensePose's predictor) — golden-parity-tested
        # against the reference module
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2),
            padding=[(2, 2), (2, 2)], transpose_kernel=True,
            dtype=jnp.float32, name="score_lowres",
        )(x.astype(jnp.float32))
        n, h, w, k = x.shape
        return jax.image.resize(x, (n, h * 2, w * 2, k), method="bilinear")


def keypoint_rcnn_loss(
    logits: jnp.ndarray,  # (S, H, H, K)
    kp_indices: jnp.ndarray,  # (S, K) int flattened heatmap position targets
    kp_valid: jnp.ndarray,  # (S, K) 1 if visible-in-roi
    fg_weights: jnp.ndarray,  # (S,) foreground roi mask
) -> jnp.ndarray:
    s, h, w, k = logits.shape
    flat = logits.reshape(s, h * w, k)
    logp = jax.nn.log_softmax(flat, axis=1)  # softmax over positions
    picked = jnp.take_along_axis(logp, kp_indices[:, None, :], axis=1)[:, 0, :]  # (S, K)
    wgt = kp_valid.astype(jnp.float32) * fg_weights[:, None]
    num = jnp.maximum(wgt.sum(), 1.0)
    return -(picked * wgt).sum() / num
