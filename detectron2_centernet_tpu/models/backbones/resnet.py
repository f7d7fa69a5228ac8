"""ResNet backbone family in flax (NHWC).

Capability match for the reference ``detectron2/modeling/backbone/resnet.py``:
``BasicStem`` (:331), ``BasicBlock`` (:33), ``BottleneckBlock`` (:101) with
``stride_in_1x1``, stage construction for depths 18/34/50/101/152 (:560-644),
``OUT_FEATURES`` selection, stage freezing via ``FREEZE_AT``.

TPU notes: freezing is ``stop_gradient`` at the frozen boundary (params above
receive no gradient — same effect as requires_grad=False) with FrozenBN
statistics; all convs are XLA ``nn.Conv`` so they tile straight onto the MXU.
Deformable stages (``DEFORM_ON_PER_STAGE``) swap the 3x3 for the
ops/deform_conv modulated kernel.
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import CfgNode
from ...ops.deform_conv import modulated_deform_conv
from ..layers import FrozenBatchNorm, get_norm
from ..registry import BACKBONE_REGISTRY

# depth -> (block type, stage repeat counts)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _Norm(nn.Module):
    """Norm dispatcher: FrozenBN / BN / GN by name."""

    norm: str
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm == "FrozenBN":
            return FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        if self.norm in ("BN", "SyncBN", "naiveSyncBN"):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="bn",
            )(x)
        if self.norm == "GN":
            return nn.GroupNorm(num_groups=32, dtype=self.dtype, name="gn")(x)
        if self.norm == "":
            return x
        raise ValueError(f"Unknown norm {self.norm}")


class BasicStem(nn.Module):
    """7x7 s2 conv + norm + relu + 3x3 s2 maxpool (reference resnet.py:331)."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = _Norm(self.norm, self.out_channels, self.dtype, name="conv1_norm")(x, train)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class DeepLabStem(nn.Module):
    """3x [3x3 conv + norm + relu] stem + maxpool (reference
    projects/DeepLab/deeplab/resnet.py:14-69; first conv s2, channels
    out/2 -> out/2 -> out)."""

    out_channels: int = 128
    norm: str = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.out_channels // 2
        for i, (ch, s) in enumerate(((half, 2), (half, 1), (self.out_channels, 1))):
            x = nn.Conv(
                ch, (3, 3), strides=s, padding=[(1, 1), (1, 1)],
                use_bias=False, dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            x = _Norm(self.norm, ch, self.dtype, name=f"conv{i + 1}_norm")(x, train)
            x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity/projection shortcut (reference resnet.py:33)."""

    out_channels: int
    stride: int = 1
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        out = nn.Conv(
            self.out_channels, (3, 3), strides=self.stride,
            padding=[(1, 1), (1, 1)],  # torch-symmetric (SAME differs at s2)
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = _Norm(self.norm, self.out_channels, self.dtype, name="conv1_norm")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.out_channels, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _Norm(self.norm, self.out_channels, self.dtype, name="conv2_norm")(out, train)
        if cin != self.out_channels or self.stride != 1:
            sc = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="shortcut",
            )(x)
            sc = _Norm(self.norm, self.out_channels, self.dtype, name="shortcut_norm")(sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class BottleneckBlock(nn.Module):
    """1x1 - 3x3 - 1x1 bottleneck (reference resnet.py:101); stride goes in
    the first 1x1 when ``stride_in_1x1`` (the Caffe2/MSRA convention)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(
            self.bottleneck_channels, (1, 1), strides=s1, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = _Norm(self.norm, self.bottleneck_channels, self.dtype, name="conv1_norm")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.bottleneck_channels, (3, 3), strides=s3,
            padding=[(self.dilation, self.dilation)] * 2,  # torch-symmetric
            kernel_dilation=self.dilation, feature_group_count=self.num_groups,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = _Norm(self.norm, self.bottleneck_channels, self.dtype, name="conv2_norm")(out, train)
        out = nn.relu(out)
        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = _Norm(self.norm, self.out_channels, self.dtype, name="conv3_norm")(out, train)
        if cin != self.out_channels or self.stride != 1:
            sc = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="shortcut",
            )(x)
            sc = _Norm(self.norm, self.out_channels, self.dtype, name="shortcut_norm")(sc, train)
        else:
            sc = x
        return nn.relu(out + sc)


class DeformBottleneckBlock(nn.Module):
    """Bottleneck with a (modulated) deformable 3x3 (reference resnet.py:214:
    DCN v1/v2 in chosen stages via DEFORM_ON_PER_STAGE)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    norm: str = "FrozenBN"
    deform_modulated: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(self.bottleneck_channels, (1, 1), strides=s1, use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = _Norm(self.norm, self.bottleneck_channels, self.dtype, name="conv1_norm")(out, train)
        out = nn.relu(out)

        # offset/mask predictor (at output resolution) + deformable 3x3
        assert s3 in (1, 2)
        nch = 27 if self.deform_modulated else 18
        om = nn.Conv(nch, (3, 3), strides=s3, padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                     name="conv2_offset")(out.astype(jnp.float32))
        if self.deform_modulated:
            offset, mask_logit = om[..., :18], om[..., 18:]
            mask = jax.nn.sigmoid(mask_logit)
        else:
            offset = om
            mask = jnp.ones(om.shape[:3] + (9,), jnp.float32)
        kernel = self.param(
            "conv2_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (3, 3, self.bottleneck_channels, self.bottleneck_channels),
            jnp.float32,
        )
        out = modulated_deform_conv(
            out, offset, mask, kernel.astype(out.dtype), None,
            stride=s3, dilation=self.dilation,
        )
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


class ResNet(nn.Module):
    """Full trunk; ``__call__`` returns {feature_name: NHWC array} for
    ``out_features`` ⊆ {stem, res2..res5} (reference resnet.py:362-553)."""

    depth: int = 50
    out_features: Sequence[str] = ("res4",)
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    # DeepLab variants (reference projects/DeepLab/deeplab/resnet.py:74-155)
    stem_type: str = "basic"  # or "deeplab"
    res4_dilation: int = 1
    res5_multi_grid: Sequence[int] = (1, 1, 1)
    norm: str = "FrozenBN"
    freeze_at: int = 0
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    dtype: Any = jnp.float32

    # stride of each produced feature, for FPN consumers
    @property
    def out_feature_strides(self) -> Dict[str, int]:
        return {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}

    def out_feature_channels(self) -> Dict[str, int]:
        block_type, _ = RESNET_SPECS[self.depth]
        c2 = self.res2_out_channels
        mult = 1 if block_type == "basic" else 1
        return {
            "stem": self.stem_out_channels,
            "res2": c2,
            "res3": c2 * 2,
            "res4": c2 * 4,
            "res5": c2 * 8,
        }

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block_type, stage_reps = RESNET_SPECS[self.depth]
        outputs: Dict[str, jnp.ndarray] = {}
        stem_cls = DeepLabStem if self.stem_type == "deeplab" else BasicStem
        x = stem_cls(self.stem_out_channels, self.norm, self.dtype, name="stem")(x, train)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        if "stem" in self.out_features:
            outputs["stem"] = x

        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        max_stage = max(
            [int(f[-1]) for f in self.out_features if f.startswith("res")] or [5]
        )
        for idx, reps in enumerate(stage_reps):
            stage = idx + 2  # res2..res5
            if stage > max_stage:
                break
            first_stride = 1 if stage == 2 else 2
            if stage == 4:
                dilation = self.res4_dilation
            elif stage == 5:
                dilation = self.res5_dilation
            else:
                dilation = 1
            if dilation > 1:
                first_stride = 1
            deform = self.deform_on_per_stage[idx]
            for b in range(reps):
                stride = first_stride if b == 0 else 1
                if stage == 5 and tuple(self.res5_multi_grid) != (1, 1, 1):
                    # per-block multi-grid dilations (reference deeplab
                    # resnet.py:151: dilation * multi_grid[block])
                    mg = self.res5_multi_grid[min(b, len(self.res5_multi_grid) - 1)]
                    dilation = self.res5_dilation * int(mg)
                if block_type == "basic":
                    x = BasicBlock(
                        out_channels, stride=stride, norm=self.norm,
                        dtype=self.dtype, name=f"res{stage}_block{b}",
                    )(x, train)
                elif deform:
                    x = DeformBottleneckBlock(
                        out_channels, bottleneck_channels, stride=stride,
                        stride_in_1x1=self.stride_in_1x1, dilation=dilation,
                        norm=self.norm, deform_modulated=self.deform_modulated,
                        dtype=self.dtype, name=f"res{stage}_block{b}",
                    )(x, train)
                else:
                    x = BottleneckBlock(
                        out_channels, bottleneck_channels, stride=stride,
                        stride_in_1x1=self.stride_in_1x1, dilation=dilation,
                        num_groups=self.num_groups, norm=self.norm,
                        dtype=self.dtype, name=f"res{stage}_block{b}",
                    )(x, train)
            if self.freeze_at >= stage:
                x = jax.lax.stop_gradient(x)
            if f"res{stage}" in self.out_features:
                outputs[f"res{stage}"] = x
            out_channels *= 2
            bottleneck_channels *= 2
        return outputs


def build_resnet(cfg: CfgNode, dtype: Any = jnp.float32, out_features: Optional[Sequence[str]] = None) -> ResNet:
    r = cfg.MODEL.RESNETS
    return ResNet(
        depth=r.DEPTH,
        out_features=tuple(out_features or r.OUT_FEATURES),
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        stride_in_1x1=r.STRIDE_IN_1X1,
        res5_dilation=r.RES5_DILATION,
        norm=r.NORM,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_AT,
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=bool(r.DEFORM_MODULATED),
        stem_type=str(r.STEM_TYPE),
        res4_dilation=int(r.RES4_DILATION),
        res5_multi_grid=tuple(r.RES5_MULTI_GRID),
        dtype=dtype,
    )


@BACKBONE_REGISTRY.register()
def build_resnet_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> ResNet:
    return build_resnet(cfg, dtype)


@BACKBONE_REGISTRY.register()
def build_resnet_deeplab_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> ResNet:
    """DeepLab trunk (reference projects/DeepLab/deeplab/resnet.py:74-158):
    the 3x3x3 DeepLab stem + dilated res4/res5 with multi-grid; output
    stride set by RES4_DILATION/RES5_DILATION (os16: res5 d=2 mg=(1,2,4))."""
    r = cfg.MODEL.RESNETS
    assert r.STEM_TYPE == "deeplab" or r.RES5_DILATION > 1 or r.RES4_DILATION > 1
    return build_resnet(cfg, dtype)


class ResNetDeconv(nn.Module):
    """CenterNet's ResNet path: trunk res5 -> 3 deconv(256,128,64) stages
    (reference meta_arch/centernet.py:268-320 uses res4 + 2 deconvs at
    down_ratio 4 with size_div 16; upstream CenterNet uses res5 + 3 deconvs —
    we follow the reference: 2x [ConvTranspose k4 s2 + BN + ReLU] from res4)."""

    trunk: ResNet
    head_channels: int = 256
    num_deconv: int = 2
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.head_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = self.trunk(x, train)
        y = feats["res4"]
        for i in range(self.num_deconv):
            y = nn.ConvTranspose(
                self.head_channels, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, name=f"deconv{i}",
            )(y)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"deconv{i}_bn",
            )(y)
            y = nn.relu(y)
        return y


@BACKBONE_REGISTRY.register()
def build_resnet_deconv_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> ResNetDeconv:
    trunk = build_resnet(cfg, dtype, out_features=("res4",))
    return ResNetDeconv(trunk=trunk, dtype=dtype)
