"""DefaultPredictor e2e (reference engine/defaults.py:154-218): single
uint8 image in INPUT.FORMAT order -> {"instances": Instances} at the
original resolution; RGB and BGR inputs of the same scene agree."""

import numpy as np

import jax

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.engine import DefaultPredictor


def _cfg(fmt):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_deconv_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 16
    cfg.MODEL.CENTERNET.NUM_CLASSES = 3
    cfg.MODEL.CENTERNET.HEAD_CONV = 16
    cfg.MODEL.WEIGHTS = ""
    cfg.INPUT.TEST_SIZE = (64, 64)
    cfg.INPUT.FORMAT = fmt
    cfg.TPU.DTYPE = "float32"
    cfg.freeze()
    return cfg


def test_default_predictor_formats():
    rng = np.random.RandomState(0)
    img_bgr = (rng.rand(50, 70, 3) * 255).astype(np.uint8)

    p_bgr = DefaultPredictor(_cfg("BGR"))
    out_bgr = p_bgr(img_bgr)
    inst = out_bgr["instances"]
    assert inst.image_size == (50, 70)
    assert inst.pred_boxes.tensor.shape[1] == 4

    # same scene in RGB order through an RGB-configured predictor, with the
    # SAME weights: identical detections
    p_rgb = DefaultPredictor(_cfg("RGB"))
    p_rgb.variables = p_bgr.variables
    p_rgb._predict = jax.jit(p_rgb.model.predict_fn)
    out_rgb = p_rgb(img_bgr[:, :, ::-1])
    np.testing.assert_allclose(
        np.asarray(out_rgb["instances"].pred_boxes.tensor),
        np.asarray(inst.pred_boxes.tensor),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_rgb["instances"].scores),
        np.asarray(inst.scores),
        atol=1e-5,
    )
