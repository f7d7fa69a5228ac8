"""TEST.EXACT_MODE must disable every accuracy-affecting fast path."""

import jax.numpy as jnp

from detectron2_centernet_tpu import model_zoo
from detectron2_centernet_tpu.models import build_model


def _ctdet_cfg():
    cfg = model_zoo.get_config("COCO-Detection/ctdet_dla_34_1x.yaml")
    cfg.DATASETS.TRAIN = ()
    return cfg


def test_default_fast_paths_on():
    cfg = _ctdet_cfg()
    model = build_model(cfg)
    assert model.approx_topk is True
    assert model.exact_mode is False
    assert model.backbone.dcn_impl == "auto"


def test_exact_mode_forces_exact_paths():
    cfg = _ctdet_cfg()
    cfg.TPU.APPROX_TOPK = True
    cfg.TPU.DCN_IMPL = "pallas"
    cfg.TPU.DCN_WINDOW = 4
    cfg.TEST.EXACT_MODE = True
    model = build_model(cfg)
    assert model.approx_topk is False
    assert model.exact_mode is True
    assert model.backbone.dcn_impl == "exact"
    assert model.backbone.dcn_window == 0


def test_inference_acc_schedule_pins_exact_mode():
    cfg = model_zoo.get_config(
        "quick_schedules/ctdet_dla_34_inference_acc_test.yaml"
    )
    assert cfg.TEST.EXACT_MODE is True
