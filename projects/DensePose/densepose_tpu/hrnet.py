"""HRNet trunk + HRFPN neck, TPU-native flax.

Capability of the reference's ``projects/DensePose/densepose/modeling/
hrnet.py`` (PoseHigherResolutionNet) and ``hrfpn.py`` (HRFPN) — the
backbone behind the ``densepose_rcnn_HRFPN_HRNet_w*`` configs.  Design
differences from the torch original, chosen for XLA:

* Every branch resolution is an exact power-of-two fraction of the input
  (SAME-padded strided convs / ``jax.image.resize``), so none of the
  reference's runtime shape-cropping (``x[:, :, :y.shape[2]]``) exists —
  shapes are static by construction.
* The reference's "custom" HRFPN upsampler (ConvTranspose k4 s2^i with
  no padding, then crop) becomes a SAME ConvTranspose producing exactly
  stride-4 maps.
* BatchNorm sync across data-parallel replicas is automatic under the
  sharded mesh (models/layers.py get_norm docstring).
"""

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from detectron2_centernet_tpu.models.backbones.resnet import (
    BasicBlock,
    BottleneckBlock,
)
from detectron2_centernet_tpu.models.registry import BACKBONE_REGISTRY

__all__ = ["HRNet", "HRFPN", "build_hrfpn_backbone"]

_NORM = "BN"


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding="SAME", use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x) if self.relu else x


class HRModule(nn.Module):
    """One multi-resolution exchange unit (reference hrnet.py:98-268):
    per-branch block chains followed by the all-pairs fuse — j>i upsampled
    through a 1x1 conv+BN, j<i downsampled through chained stride-2 convs."""

    num_branches: int
    num_blocks: Sequence[int]
    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        assert len(xs) == self.num_branches
        ys = []
        for i in range(self.num_branches):
            y = xs[i]
            for b in range(self.num_blocks[i]):
                y = BasicBlock(
                    out_channels=self.channels[i], norm=_NORM,
                    dtype=self.dtype, name=f"branch{i}_block{b}",
                )(y, train)
            ys.append(y)

        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    z = ys[j]
                elif j > i:
                    # low-res -> high-res: 1x1 conv + BN, nearest upsample
                    z = nn.Conv(
                        self.channels[i], (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"fuse{i}_{j}_conv",
                    )(ys[j])
                    z = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        dtype=self.dtype, name=f"fuse{i}_{j}_bn",
                    )(z)
                    n, h, w, c = z.shape
                    s = 2 ** (j - i)
                    z = jax.image.resize(z, (n, h * s, w * s, c), "nearest")
                else:
                    # high-res -> low-res: chained stride-2 3x3 conv+BN
                    # (+relu except the last), reference hrnet.py:208-242
                    z = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        z = _ConvBNRelu(
                            self.channels[i] if last else self.channels[j],
                            stride=2, relu=not last, dtype=self.dtype,
                            name=f"fuse{i}_{j}_down{k}",
                        )(z, train)
                acc = z if acc is None else acc + z
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """The w-family trunk: stem (stride 4) -> bottleneck layer1 ->
    3 multi-resolution stages; emits one map per branch at strides
    4, 8, 16, 32."""

    stage_channels: Tuple[Sequence[int], ...]  # per stage2/3/4
    stage_modules: Tuple[int, ...] = (1, 4, 3)
    stage_blocks: Tuple[Sequence[int], ...] = ((4, 4), (4, 4, 4), (4, 4, 4, 4))
    stem_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        x = _ConvBNRelu(self.stem_channels, stride=2, dtype=self.dtype,
                        name="stem1")(x, train)
        x = _ConvBNRelu(self.stem_channels, stride=2, dtype=self.dtype,
                        name="stem2")(x, train)
        for b in range(4):  # layer1: 4 bottlenecks, 64 -> 256
            x = BottleneckBlock(
                out_channels=256, bottleneck_channels=64, norm=_NORM,
                stride_in_1x1=False, dtype=self.dtype, name=f"layer1_{b}",
            )(x, train)

        xs = [x]
        for s, (chans, mods, blocks) in enumerate(
            zip(self.stage_channels, self.stage_modules, self.stage_blocks)
        ):
            # transition: match channels per existing branch, spawn the new
            # branch from the last with a stride-2 conv (hrnet.py:340-374)
            new_xs = []
            for i, c in enumerate(chans):
                if i < len(xs):
                    if xs[i].shape[-1] != c:
                        new_xs.append(
                            _ConvBNRelu(c, dtype=self.dtype,
                                        name=f"trans{s}_{i}")(xs[i], train)
                        )
                    else:
                        new_xs.append(xs[i])
                else:
                    new_xs.append(
                        _ConvBNRelu(c, stride=2, dtype=self.dtype,
                                    name=f"trans{s}_{i}")(xs[-1], train)
                    )
            xs = new_xs
            for m in range(mods):
                xs = HRModule(
                    num_branches=len(chans), num_blocks=blocks,
                    channels=chans, dtype=self.dtype, name=f"stage{s + 2}_{m}",
                )(xs, train)
        return xs


class HRFPN(nn.Module):
    """High-resolution feature pyramid (reference hrfpn.py:32-161): every
    branch is brought to stride 4 (ConvTranspose k4 s2^i + BN + ReLU),
    concatenated, then each output level p1..pN applies one k=2^i s=2^i
    reduction conv + BN + ReLU and a 3x3 conv.  Output strides 4..64."""

    out_channels: int = 256
    n_out: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False):
        ups = []
        for i, x in enumerate(xs):
            c = x.shape[-1]
            if i == 0:
                up = x
            else:
                up = nn.ConvTranspose(
                    c, (4, 4), strides=(2 ** i, 2 ** i), padding="SAME",
                    use_bias=False, dtype=self.dtype, name=f"interp{i}_deconv",
                )(x)
                up = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    dtype=self.dtype, name=f"interp{i}_bn",
                )(up)
                up = nn.relu(up)
            ups.append(up)
        cat = jnp.concatenate(ups, axis=-1)

        out = {}
        for i in range(self.n_out):
            k = 2 ** i
            y = nn.Conv(
                self.out_channels, (k, k), strides=k, padding="VALID",
                dtype=self.dtype, name=f"reduce{i}_conv",
            )(cat)
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                dtype=self.dtype, name=f"reduce{i}_bn",
            )(y)
            y = nn.relu(y)
            out[f"p{i + 1}"] = nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"fpn{i}_conv",
            )(y)
        return out


class _HRFPNBackbone(nn.Module):
    """hrnet trunk + hrfpn neck as one backbone module."""

    stage_channels: Tuple[Sequence[int], ...]
    stage_modules: Tuple[int, ...]
    stage_blocks: Tuple[Sequence[int], ...]
    out_channels: int
    n_out: int
    dtype: Any = jnp.float32
    # strides for the meta-arch (HRFPN's p1 is stride 4, unlike FPN's p2)
    out_feature_strides = {"p1": 4, "p2": 8, "p3": 16, "p4": 32, "p5": 64}

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = HRNet(
            stage_channels=self.stage_channels,
            stage_modules=self.stage_modules,
            stage_blocks=self.stage_blocks,
            dtype=self.dtype,
            name="hrnet",
        )(x, train)
        return HRFPN(
            out_channels=self.out_channels, n_out=self.n_out,
            dtype=self.dtype, name="hrfpn",
        )(xs, train)


@BACKBONE_REGISTRY.register()
def build_hrfpn_backbone(cfg, dtype: Any = jnp.float32):
    h = cfg.MODEL.HRNET
    n_out = len(cfg.MODEL.ROI_HEADS.IN_FEATURES) if len(
        cfg.MODEL.ROI_HEADS.IN_FEATURES
    ) else 5
    return _HRFPNBackbone(
        stage_channels=(
            tuple(h.STAGE2.NUM_CHANNELS),
            tuple(h.STAGE3.NUM_CHANNELS),
            tuple(h.STAGE4.NUM_CHANNELS),
        ),
        stage_modules=(
            int(h.STAGE2.NUM_MODULES),
            int(h.STAGE3.NUM_MODULES),
            int(h.STAGE4.NUM_MODULES),
        ),
        stage_blocks=(
            tuple(h.STAGE2.NUM_BLOCKS),
            tuple(h.STAGE3.NUM_BLOCKS),
            tuple(h.STAGE4.NUM_BLOCKS),
        ),
        out_channels=int(h.HRFPN.OUT_CHANNELS),
        n_out=n_out,
        dtype=dtype,
    )
