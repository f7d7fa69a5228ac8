"""VoVNet(V2) backbone with OSA blocks + eSE attention, in flax (NHWC).

Capability match for the reference ``detectron2/modeling/backbone/vovnet.py``:
the variant table (:27-93), OSA module with identity residual + eSE channel
attention (:194-299), stage construction with stride-2 maxpools (:301-412),
``build_vovnet_backbone`` (:414).  Depthwise variants ("dw") use grouped 3x3
convs like the reference.
"""

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...config import CfgNode
from ..registry import BACKBONE_REGISTRY

# variant -> (stem, stage_conv_ch, stage_out_ch, layer_per_block, block_per_stage, eSE, dw)
VOVNET_SPECS = {
    "V-19-slim-dw-eSE": ([64, 64, 64], [64, 80, 96, 112], [112, 256, 384, 512], 3, [1, 1, 1, 1], True, True),
    "V-19-dw-eSE": ([64, 64, 64], [128, 160, 192, 224], [256, 512, 768, 1024], 3, [1, 1, 1, 1], True, True),
    "V-19-slim-eSE": ([64, 64, 128], [64, 80, 96, 112], [112, 256, 384, 512], 3, [1, 1, 1, 1], True, False),
    "V-19-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 3, [1, 1, 1, 1], True, False),
    "V-39-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 1, 2, 2], True, False),
    "V-57-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 1, 4, 3], True, False),
    "V-99-eSE": ([64, 64, 128], [128, 160, 192, 224], [256, 512, 768, 1024], 5, [1, 3, 9, 3], True, False),
}


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    use_relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), strides=self.stride,
            padding=[((self.kernel - 1) // 2, (self.kernel - 1) // 2)] * 2,
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm",
        )(x)
        return nn.relu(x) if self.use_relu else x


class eSEModule(nn.Module):
    """Effective squeeze-excite: gap -> 1x1 conv -> hsigmoid gate
    (reference vovnet.py:209-224)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc")(gap)
        gate = jnp.clip(w + 3.0, 0.0, 6.0) / 6.0  # hard sigmoid
        return x * gate


class OSABlock(nn.Module):
    """One-shot aggregation: k successive 3x3 convs, concat all taps,
    1x1 reduce, eSE, optional identity (reference vovnet.py:227-299)."""

    conv_ch: int
    out_ch: int
    layer_per_block: int
    use_ese: bool = True
    depthwise: bool = False
    identity: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity_feat = x
        outputs = [x]
        h = x
        if self.depthwise and h.shape[-1] != self.conv_ch:
            h = ConvNormAct(self.conv_ch, kernel=1, dtype=self.dtype, name="reduction")(h, train)
            outputs = [h]
        for i in range(self.layer_per_block):
            if self.depthwise:
                h = ConvNormAct(
                    self.conv_ch, kernel=3, groups=self.conv_ch, dtype=self.dtype,
                    name=f"layer{i}_dw",
                )(h, train)
                h = ConvNormAct(self.conv_ch, kernel=1, dtype=self.dtype, name=f"layer{i}_pw")(h, train)
            else:
                h = ConvNormAct(self.conv_ch, kernel=3, dtype=self.dtype, name=f"layer{i}")(h, train)
            outputs.append(h)
        cat = jnp.concatenate(outputs, axis=-1)
        out = ConvNormAct(self.out_ch, kernel=1, dtype=self.dtype, name="concat")(cat, train)
        if self.use_ese:
            out = eSEModule(self.out_ch, dtype=self.dtype, name="ese")(out)
        if self.identity:
            out = out + identity_feat
        return out


class VoVNet(nn.Module):
    """Trunk producing {stage2..stage5} feature maps (strides 4/8/16/32)."""

    variant: str = "V-39-eSE"
    out_features: Sequence[str] = ("stage2", "stage3", "stage4", "stage5")
    dtype: Any = jnp.float32

    def out_feature_channels(self) -> Dict[str, int]:
        _, _, out_ch, _, _, _, _ = VOVNET_SPECS[self.variant]
        return {f"stage{i+2}": c for i, c in enumerate(out_ch)}

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        return {"stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stem_ch, conv_ch, out_ch, layer_per_block, block_per_stage, ese, dw = VOVNET_SPECS[
            self.variant
        ]
        # stem: 3 convs, stride 2 on first and last (overall stride 4)
        x = ConvNormAct(stem_ch[0], stride=2, dtype=self.dtype, name="stem1")(x, train)
        g = stem_ch[1] if dw else 1
        x = ConvNormAct(stem_ch[1], groups=g if dw else 1, dtype=self.dtype, name="stem2")(x, train)
        x = ConvNormAct(stem_ch[2], stride=2, dtype=self.dtype, name="stem3")(x, train)

        outputs: Dict[str, jnp.ndarray] = {}
        for s in range(4):
            stage = s + 2
            if s > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            for b in range(block_per_stage[s]):
                x = OSABlock(
                    conv_ch[s], out_ch[s], layer_per_block, use_ese=ese,
                    depthwise=dw, identity=(b > 0), dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, train)
            if f"stage{stage}" in self.out_features:
                outputs[f"stage{stage}"] = x
        return outputs


@BACKBONE_REGISTRY.register()
def build_vovnet_backbone(cfg: CfgNode, dtype: Any = jnp.float32) -> VoVNet:
    v = cfg.MODEL.VOVNET
    return VoVNet(variant=v.CONV_BODY, out_features=tuple(v.OUT_FEATURES), dtype=dtype)
