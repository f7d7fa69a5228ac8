"""DefaultPredictor e2e (reference engine/defaults.py:154-218): takes ONE
BGR uint8 image (the cv2 convention) and converts to the model's
INPUT.FORMAT; an RGB-format predictor must feed the model reversed
channels of the same BGR input."""

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

    # an RGB-format predictor with the SAME weights must equal running the
    # BGR predictor on reversed channels: INPUT.FORMAT converts the BGR
    # input into the model's expected order (reference defaults.py:209-211)
    p_rgb = DefaultPredictor(_cfg("RGB"))
    p_rgb.variables = p_bgr.variables
    p_rgb._predict = jax.jit(p_rgb.model.predict_fn)
    out_rgb = p_rgb(img_bgr)
    ref = p_bgr(img_bgr[:, :, ::-1])  # model sees the same reversed pixels
    np.testing.assert_allclose(
        np.asarray(out_rgb["instances"].pred_boxes.tensor),
        np.asarray(ref["instances"].pred_boxes.tensor),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_rgb["instances"].scores),
        np.asarray(ref["instances"].scores),
        atol=1e-5,
    )
