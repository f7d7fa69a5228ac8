"""MODEL.LOAD_PROPOSALS workflow: file -> dataset dicts -> mapper -> model.

Reference: data/build.py:102-155 (load_proposals_into_dataset),
proposal_generator/build.py:18-22 (PrecomputedProposals), the Fast R-CNN
config COCO-Detection/fast_rcnn_R_50_FPN_1x.yaml.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.data.build import load_proposals_into_dataset
from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.structures import BoxMode


def _dicts():
    rng = np.random.RandomState(3)
    out = []
    for i in range(2):
        out.append(
            {
                "image": (rng.rand(60, 80, 3) * 255).astype(np.uint8),
                "height": 60,
                "width": 80,
                "image_id": 100 + i,
                "annotations": [
                    {
                        "bbox": [10.0, 10.0, 30.0, 25.0],
                        "bbox_mode": BoxMode.XYWH_ABS,
                        "category_id": 0,
                        "iscrowd": 0,
                    }
                ],
            }
        )
    return out


def _proposal_file(tmp_path, ids, n=6):
    rng = np.random.RandomState(0)
    boxes, logits = [], []
    for _ in ids:
        x0 = rng.rand(n, 1) * 30
        y0 = rng.rand(n, 1) * 20
        b = np.concatenate([x0, y0, x0 + 10 + rng.rand(n, 1) * 30,
                            y0 + 10 + rng.rand(n, 1) * 20], 1)
        boxes.append(b.astype(np.float32))
        logits.append(rng.randn(n).astype(np.float32))
    path = tmp_path / "props.pkl"
    with open(path, "wb") as f:
        pickle.dump({"ids": list(ids), "boxes": boxes,
                     "objectness_logits": logits}, f)
    return str(path)


def test_load_proposals_into_dataset(tmp_path):
    dicts = _dicts()
    path = _proposal_file(tmp_path, [d["image_id"] for d in dicts])
    out = load_proposals_into_dataset(dicts, path)
    for d in out:
        assert d["proposal_boxes"].shape == (6, 4)
        assert d["proposal_objectness_logits"].shape == (6,)
        assert d["proposal_bbox_mode"] == BoxMode.XYXY_ABS


def test_mapper_emits_fixed_proposal_slots(tmp_path):
    cfg = get_cfg()
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN = 10
    dicts = _dicts()
    path = _proposal_file(tmp_path, [d["image_id"] for d in dicts])
    dicts = load_proposals_into_dataset(dicts, path)
    mapper = DatasetMapper(cfg, is_train=True)
    out = mapper(dicts[0], rng=np.random.RandomState(0))
    assert out["proposal_boxes"].shape == (10, 4)
    assert out["proposal_valid"].shape == (10,)
    assert 0 < out["proposal_valid"].sum() <= 6
    # objectness sorted descending over the valid slots
    lg = out["proposal_objectness_logits"][out["proposal_valid"]]
    assert (np.diff(lg) <= 1e-6).all()
    # an image without proposals still maps, with all slots invalid
    d2 = _dicts()[0]
    out2 = mapper(d2, rng=np.random.RandomState(0))
    assert out2["proposal_valid"].sum() == 0


def _fast_rcnn_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 64
    cfg.TPU.DTYPE = "float32"
    return cfg


def test_fast_rcnn_train_and_infer_with_precomputed_proposals():
    cfg = _fast_rcnn_cfg()
    model = build_model(cfg)
    assert model.precomputed_proposals
    v = model.init(jax.random.PRNGKey(0), (64, 64))
    rng = np.random.RandomState(0)
    k = 8
    pb = np.zeros((1, k, 4), np.float32)
    pb[0, :, 0] = rng.rand(k) * 20
    pb[0, :, 1] = rng.rand(k) * 20
    pb[0, :, 2] = pb[0, :, 0] + 10 + rng.rand(k) * 20
    pb[0, :, 3] = pb[0, :, 1] + 10 + rng.rand(k) * 20
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 64, 3) * 255, jnp.float32),
        "gt_boxes": jnp.asarray([[[8.0, 8.0, 40.0, 40.0]]], np.float32),
        "gt_classes": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
        "proposal_boxes": jnp.asarray(pb),
        "proposal_valid": jnp.ones((1, k), bool),
        "rng": jax.random.PRNGKey(1),
    }
    total, (ld, _) = model.loss_fn(v["params"], v.get("batch_stats", {}), batch)
    assert np.isfinite(float(total))
    assert "loss_cls" in ld and "loss_box_reg" in ld
    assert not any("rpn" in key for key in ld)  # no RPN losses

    dets = model.predict_fn(
        v, batch["image"], batch["proposal_boxes"], batch["proposal_valid"]
    )
    assert dets["boxes"].shape[0] == 1
    assert np.isfinite(np.asarray(dets["scores"])).all()
