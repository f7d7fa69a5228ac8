"""TridentNet backbone (the reference's ``projects/TridentNet`` capability).

A C4 ResNet whose res4 stage is a *trident* stage: three branches with
SHARED convolution weights but different dilations (1, 2, 3), giving
scale-specific receptive fields with no extra parameters.  Training folds
the branches into the batch axis (N -> 3N, ground truth tiled per branch);
inference runs only the middle branch — the "TridentNet Fast" approximation
the reference project's configs use (trident_fast_R_*).
"""

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import CfgNode
from ..registry import BACKBONE_REGISTRY
from .resnet import RESNET_SPECS, BasicStem, BottleneckBlock, _Norm


class TridentBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv runs at ``dilations`` with one shared
    kernel; input/output are branch-folded along batch."""

    out_channels: int
    bottleneck_channels: int
    dilations: Tuple[int, ...] = (1, 2, 3)
    stride: int = 1
    stride_in_1x1: bool = True
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        num_branch: int = 3,
        branch_idx: int = -1,
    ):
        """x: (B*num_branch, H, W, C) branch-folded (or (B,...) single;
        ``branch_idx`` selects the dilation then, -1 = middle)."""
        cin = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=s1, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = _Norm(self.norm, self.bottleneck_channels, self.dtype, name="conv1_norm")(out, train)
        out = nn.relu(out)

        kernel = self.param(
            "conv2_kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (3, 3, self.bottleneck_channels, self.bottleneck_channels),
            jnp.float32,
        ).astype(out.dtype)

        def branch_conv(xb, dilation):
            return jax.lax.conv_general_dilated(
                xb, kernel, (s3, s3),
                padding=[(dilation, dilation)] * 2,
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if num_branch == 1:
            idx = branch_idx if branch_idx >= 0 else len(self.dilations) // 2
            out = branch_conv(out, self.dilations[idx])
        else:
            b = out.shape[0] // num_branch
            parts = [
                branch_conv(out[i * b : (i + 1) * b], d)
                for i, d in enumerate(self.dilations[:num_branch])
            ]
            out = jnp.concatenate(parts, axis=0)
        out = _Norm(self.norm, self.bottleneck_channels, self.dtype, name="conv2_norm")(out, train)
        out = nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = _Norm(self.norm, self.out_channels, self.dtype, name="conv3_norm")(out, train)
        if cin != self.out_channels or self.stride != 1:
            sc = nn.Conv(self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                         dtype=self.dtype, name="shortcut")(x)
            sc = _Norm(self.norm, self.out_channels, self.dtype, name="shortcut_norm")(sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class TridentResNet(nn.Module):
    """ResNet through res3, then the weight-shared trident res4 stage.

    Output dict has ``res4`` with batch 3N while ``train`` (branch-folded,
    dilations 1/2/3). At eval: ``test_branch_idx >= 0`` runs that single
    branch on batch N (TridentNet Fast); ``test_branch_idx == -1`` (full
    TridentNet, reference TEST_BRANCH_IDX=-1) expects the CALLER to tile
    the image batch to 3N — the trident stage then applies each branch's
    dilation to its batch fold (stem/res2/res3 recompute per fold; the
    redundancy is the price of keeping one static batch shape)."""

    depth: int = 50
    num_branch: int = 3
    dilations: Sequence[int] = (1, 2, 3)
    test_branch_idx: int = 1
    out_features: Sequence[str] = ("res4",)
    res2_out_channels: int = 256
    stem_out_channels: int = 64
    width_per_group: int = 64
    stride_in_1x1: bool = True
    norm: str = "FrozenBN"
    freeze_at: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        block_type, stage_reps = RESNET_SPECS[self.depth]
        assert block_type == "bottleneck", "TridentNet needs a bottleneck ResNet"
        x = BasicStem(self.stem_out_channels, self.norm, self.dtype, name="stem")(x, train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        out_channels = self.res2_out_channels
        bottleneck = self.width_per_group
        for idx, reps in enumerate(stage_reps[:2]):  # res2, res3
            stage = idx + 2
            for b in range(reps):
                x = BottleneckBlock(
                    out_channels, bottleneck, stride=(1 if stage == 2 or b else 2),
                    stride_in_1x1=self.stride_in_1x1, norm=self.norm,
                    dtype=self.dtype, name=f"res{stage}_block{b}",
                )(x, train)
            if self.freeze_at >= stage:
                x = jax.lax.stop_gradient(x)
            out_channels *= 2
            bottleneck *= 2

        # trident res4: fold branches into batch while training; at eval
        # full-test mode (test_branch_idx == -1) the batch arrives pre-tiled
        if train:
            nb = self.num_branch
            x = jnp.tile(x, (nb, 1, 1, 1))
        elif self.test_branch_idx < 0:
            nb = self.num_branch
        else:
            nb = 1
        for b in range(stage_reps[2]):
            x = TridentBottleneckBlock(
                out_channels, bottleneck, stride=(2 if b == 0 else 1),
                dilations=tuple(self.dilations),
                stride_in_1x1=self.stride_in_1x1, norm=self.norm,
                dtype=self.dtype, name=f"res4_block{b}",
            )(x, train, num_branch=nb, branch_idx=self.test_branch_idx)
        return {"res4": x}


@BACKBONE_REGISTRY.register()
def build_trident_resnet_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> TridentResNet:
    r = cfg.MODEL.RESNETS
    t = cfg.MODEL.TRIDENT
    return TridentResNet(
        depth=r.DEPTH,
        num_branch=t.NUM_BRANCH,
        dilations=tuple(t.BRANCH_DILATIONS),
        test_branch_idx=t.TEST_BRANCH_IDX,
        out_features=tuple(r.OUT_FEATURES),
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        width_per_group=r.WIDTH_PER_GROUP,
        stride_in_1x1=r.STRIDE_IN_1X1,
        norm=r.NORM,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        dtype=dtype,
    )
