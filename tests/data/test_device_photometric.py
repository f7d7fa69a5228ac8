"""Device-side color jitter (ops/photometric.py) + uint8 loader path."""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.ops.photometric import device_color_jitter


def test_jitter_changes_pixels_reasonably():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(4, 32, 32, 3) * 255, jnp.float32)
    out = device_color_jitter(imgs, jax.random.PRNGKey(0), prob=1.0)
    assert out.shape == imgs.shape
    d = np.abs(np.asarray(out) - np.asarray(imgs))
    assert d.max() > 1.0  # something happened
    # stays in a sane display range (jitter factors are <= 1.2)
    assert np.asarray(out).max() < 255 * 1.8

def test_jitter_prob_zero_is_identity():
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.rand(2, 16, 16, 3) * 255, jnp.float32)
    out = device_color_jitter(imgs, jax.random.PRNGKey(0), prob=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-3)

def test_mapper_ships_uint8_and_model_gets_hook():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_dla34_backbone"
    cfg.MODEL.CENTERNET.LEVELS = [1, 1, 1, 1, 1, 1]
    cfg.MODEL.CENTERNET.CHANNELS = [4, 8, 8, 16, 16, 16]
    cfg.MODEL.CENTERNET.HEAD_CONV = 8
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    mapper = DatasetMapper(cfg, is_train=True)
    assert mapper.photometric is None  # moved on device
    d = {
        "image": (np.random.RandomState(0).rand(48, 56, 3) * 255).astype(np.uint8),
        "height": 48, "width": 56, "image_id": 0,
        "annotations": [{"bbox": [5, 5, 20, 20], "bbox_mode": 0,
                         "category_id": 0, "iscrowd": 0}],
    }
    out = mapper(d, rng=np.random.RandomState(0))
    assert out["image"].dtype == np.uint8
    model = build_model(cfg)
    assert getattr(model, "device_augment", None) is not None

    cfg2 = cfg.clone()
    cfg2.DATALOADER.DEVICE_PHOTOMETRIC = False
    mapper2 = DatasetMapper(cfg2, is_train=True)
    assert mapper2.photometric is not None
    assert mapper2(d, rng=np.random.RandomState(0))["image"].dtype == np.float32
