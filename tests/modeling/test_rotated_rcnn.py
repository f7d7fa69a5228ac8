"""RotatedRCNN (RRPN + RROIHeads) end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.models.box_regression import Box2BoxTransformRotated
from detectron2_centernet_tpu.structures.rotated_boxes import RotatedBoxes


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RRPN"
    cfg.MODEL.ROI_HEADS.NAME = "RROIHeads"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32, 64]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    cfg.MODEL.ANCHOR_GENERATOR.ANGLES = [[-90, 0, 90]]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 60
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 30
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 40
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 20
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 1
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 32
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 5
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_rotated_delta_round_trip():
    t = Box2BoxTransformRotated((10.0, 10.0, 5.0, 5.0, 1.0))
    src = jnp.asarray([[10.0, 10.0, 8.0, 6.0, 15.0]])
    dst = jnp.asarray([[12.0, 9.0, 10.0, 7.0, -170.0]])
    rec = t.apply_deltas(t.get_deltas(src, dst), src)
    got = np.asarray(rec)[0]
    np.testing.assert_allclose(got[:4], [12, 9, 10, 7], atol=1e-4)
    # angle equal modulo 360
    assert abs((got[4] - (-170.0) + 180) % 360 - 180) < 1e-3


def test_rotated_rcnn_e2e():
    cfg = _cfg()
    model = build_model(cfg)
    assert type(model).__name__ == "RotatedRCNN"
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    dets = model.predict_fn(v, jnp.zeros((1, 64, 64, 3)))
    assert dets["boxes"].shape == (1, 8, 5)

    rng = np.random.RandomState(0)
    gt = np.stack(
        [rng.rand(3) * 40 + 10, rng.rand(3) * 40 + 10, rng.rand(3) * 15 + 8,
         rng.rand(3) * 10 + 5, rng.rand(3) * 90 - 45], 1
    ).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray(gt[None]),
        "gt_classes": jnp.asarray(rng.randint(0, 3, (1, 3)), jnp.int32),
        "gt_valid": jnp.ones((1, 3), bool),
        "rng": jax.random.PRNGKey(5),
    }
    total, (ld, _) = model.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total))
    assert set(ld) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}

    out = model.postprocess(
        {k: np.asarray(x) for k, x in dets.items()}, None, [(64, 64)]
    )
    assert isinstance(out[0]["instances"].pred_boxes, RotatedBoxes)


def test_rotated_coco_evaluator():
    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.evaluation import RotatedCOCOEvaluator
    from detectron2_centernet_tpu.structures import Instances

    name = "_rot_eval_test"
    DatasetCatalog.register(
        name,
        lambda: [{
            "image_id": 1, "file_name": "x", "height": 64, "width": 64,
            "annotations": [{"bbox": [30.0, 30.0, 20.0, 10.0, 25.0],
                             "bbox_mode": 4, "category_id": 0, "iscrowd": 0}],
        }],
    )
    try:
        ev = RotatedCOCOEvaluator(name)
        ev.reset()
        inst = Instances((64, 64))
        inst.pred_boxes = RotatedBoxes(np.asarray([[30.0, 30.0, 20.0, 10.0, 25.0]]))
        inst.scores = np.asarray([0.9], np.float32)
        inst.pred_classes = np.asarray([0])
        ev.process([{"image_id": 1}], [{"instances": inst}])
        res = ev.evaluate()
        assert res["bbox"]["AP"] == 100.0
    finally:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
