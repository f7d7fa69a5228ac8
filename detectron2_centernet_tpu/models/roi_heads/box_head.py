"""Box head modules (reference ``detectron2/modeling/roi_heads/box_head.py``).

``FastRCNNConvFCHead`` (:24): N convs + M fc layers over pooled ROI features.
``FastRCNNOutputLayers`` (fast_rcnn.py:46): the (C+1)-way classifier and the
4C (or 4, class-agnostic) box-delta regressor, with the reference's
N(0, 0.01)/N(0, 0.001) inits.
"""

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["FastRCNNConvFCHead", "FastRCNNOutputLayers"]


class FastRCNNConvFCHead(nn.Module):
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (R, P, P, C) pooled rois -> (R, fc_dim) features."""
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    box_dim: int = 4  # 5 for rotated
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(R, D) -> (scores (R, C+1), deltas (R, 4C or 4))."""
        if x.ndim > 2:
            x = jnp.mean(x, axis=(1, 2))  # C4 path: global avg pool of res5
        scores = nn.Dense(
            self.num_classes + 1, kernel_init=nn.initializers.normal(0.01),
            dtype=jnp.float32, name="cls_score",
        )(x.astype(jnp.float32))
        num_bbox = (
            self.box_dim
            if self.cls_agnostic_bbox_reg
            else self.box_dim * self.num_classes
        )
        deltas = nn.Dense(
            num_bbox, kernel_init=nn.initializers.normal(0.001),
            dtype=jnp.float32, name="bbox_pred",
        )(x.astype(jnp.float32))
        return scores, deltas
