"""Feature Pyramid Network (reference ``detectron2/modeling/backbone/fpn.py``).

Top-down pathway with 1x1 lateral convs and 3x3 output convs (:17-120),
``LastLevelMaxPool`` (p6 for R-CNN, :170) and ``LastLevelP6P7`` (RetinaNet,
:185), builders (:206-250).  NHWC; upsampling is nearest ×2 (the reference's
``F.interpolate(scale_factor=2, mode="nearest")``).
"""

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...config import CfgNode
from ..registry import BACKBONE_REGISTRY
from .resnet import build_resnet


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """bottom_up trunk (dict output) -> {p2..p7} pyramid."""

    bottom_up: nn.Module
    in_features: Sequence[str]  # e.g. ("res3", "res4", "res5")
    out_channels: int = 256
    top_block: str = ""  # "" | "maxpool" | "p6p7"
    top_block_in_feature: str = "res5"  # or "p5"
    fuse_type: str = "sum"
    dtype: Any = jnp.float32

    def out_feature_names(self) -> Sequence[str]:
        strides = {"res2": 2, "res3": 3, "res4": 4, "res5": 5,
                   "stage2": 2, "stage3": 3, "stage4": 4, "stage5": 5}
        levels = [strides[f] for f in self.in_features]
        names = [f"p{l}" for l in levels]
        if self.top_block == "maxpool":
            names.append(f"p{levels[-1] + 1}")
        elif self.top_block == "p6p7":
            names.extend([f"p{levels[-1] + 1}", f"p{levels[-1] + 2}"])
        return names

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = self.bottom_up(x, train)
        ins = [feats[f] for f in self.in_features]
        # stage-numbered param names (fpn_lateral3..5) matching the
        # reference's module names so weight import aligns deterministically
        levels = [int(f[-1]) for f in self.in_features]

        # top-down: lateral 1x1 + nearest-up + 3x3 output conv
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"fpn_lateral{l}")(t)
            for l, t in zip(levels, ins)
        ]
        results = [None] * len(ins)
        prev = laterals[-1]
        results[-1] = prev
        for i in range(len(ins) - 2, -1, -1):
            top_down = _upsample2x_nearest(prev)
            prev = laterals[i] + top_down
            if self.fuse_type == "avg":
                prev = prev / 2.0
            results[i] = prev
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"fpn_output{l}",
            )(r)
            for l, r in zip(levels, results)
        ]

        names = self.out_feature_names()
        pyramid = dict(zip(names, outs))
        if self.top_block == "maxpool":
            pyramid[names[len(outs)]] = nn.max_pool(
                outs[-1], (1, 1), strides=(2, 2)
            )
        elif self.top_block == "p6p7":
            top_in = feats[self.top_block_in_feature] if self.top_block_in_feature in feats else outs[-1]
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name="top_block_p6",
            )(top_in)
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                dtype=self.dtype, name="top_block_p7",
            )(nn.relu(p6))
            pyramid[names[len(outs)]] = p6
            pyramid[names[len(outs) + 1]] = p7
        return pyramid


@BACKBONE_REGISTRY.register()
def build_resnet_fpn_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> FPN:
    """R-CNN style FPN: res2-5 laterals + p6 maxpool (reference fpn.py:206)."""
    bottom_up = build_resnet(cfg, dtype, out_features=cfg.MODEL.RESNETS.OUT_FEATURES)
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        top_block="maxpool",
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_retinanet_resnet_fpn_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> FPN:
    """RetinaNet FPN: res3-5 laterals + P6/P7 convs from res5
    (reference fpn.py:231-250)."""
    bottom_up = build_resnet(cfg, dtype, out_features=cfg.MODEL.RESNETS.OUT_FEATURES)
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        top_block="p6p7",
        top_block_in_feature="res5",
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        dtype=dtype,
    )
