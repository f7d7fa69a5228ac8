"""Backbone family shape contracts (ResNet / VoVNet / DLA / CenterNet necks)."""

import jax
import jax.numpy as jnp
import pytest

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.backbones.resnet import ResNet
from detectron2_centernet_tpu.models.backbones.vovnet import VoVNet


@pytest.mark.parametrize("depth,expect_c", [(18, 64), (50, 256)])
def test_resnet_feature_shapes(depth, expect_c):
    r = ResNet(
        depth=depth,
        out_features=("res2", "res3", "res4", "res5"),
        res2_out_channels=expect_c,
    )
    x = jnp.zeros((1, 64, 64, 3))
    outs = r.apply(r.init(jax.random.PRNGKey(0), x), x)
    assert outs["res2"].shape == (1, 16, 16, expect_c)
    assert outs["res3"].shape == (1, 8, 8, expect_c * 2)
    assert outs["res4"].shape == (1, 4, 4, expect_c * 4)
    assert outs["res5"].shape == (1, 2, 2, expect_c * 8)


def test_vovnet_feature_shapes():
    v = VoVNet(variant="V-19-slim-eSE")
    x = jnp.zeros((1, 64, 64, 3))
    outs = v.apply(v.init(jax.random.PRNGKey(0), x), x)
    assert outs["stage2"].shape == (1, 16, 16, 112)
    assert outs["stage3"].shape == (1, 8, 8, 256)
    assert outs["stage4"].shape == (1, 4, 4, 384)
    assert outs["stage5"].shape == (1, 2, 2, 512)


@pytest.mark.parametrize(
    "backbone,extra",
    [
        ("build_resnet_deconv_backbone", {"MODEL.RESNETS.DEPTH": 18, "MODEL.RESNETS.RES2_OUT_CHANNELS": 64}),
        ("build_vovnet_backbone", {"MODEL.VOVNET.CONV_BODY": "V-19-slim-eSE"}),
    ],
)
def test_centernet_with_alt_backbones(backbone, extra):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = backbone
    cfg.MODEL.CENTERNET.TASK.HM = 3
    cfg.MODEL.CENTERNET.HEAD_CONV = 16
    cfg.TPU.DTYPE = "float32"
    cfg.merge_from_list([kv for pair in extra.items() for kv in (pair[0], str(pair[1]))])
    m = build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), (64, 64))
    out = m.predict_fn(v, jnp.zeros((2, 64, 64, 3)))
    assert out["boxes"].shape == (2, 100, 4)
    assert out["scores"].shape == (2, 100)
