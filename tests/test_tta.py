"""TTA variants + host NMS merge."""

import numpy as np

from detectron2_centernet_tpu.data.detection_utils import (
    apply_affine_to_boxes,
    letterbox_and_flip_variants,
    unwarp_boxes,
)
from detectron2_centernet_tpu.models.test_time_augmentation import numpy_nms


def test_variants_count_and_shapes():
    img = np.random.rand(60, 100, 3).astype(np.float32) * 255
    variants = list(letterbox_and_flip_variants(img, [64, 96], flip=True))
    assert len(variants) == 4
    sizes = [v[0].shape for v in variants]
    assert sizes == [(64, 64, 3), (64, 64, 3), (96, 96, 3), (96, 96, 3)]


def test_flip_warp_round_trips_boxes():
    img = np.random.rand(50, 100, 3).astype(np.float32)
    box = np.array([[10.0, 20.0, 40.0, 45.0]])
    for warped, m, flipped, size in letterbox_and_flip_variants(img, [64], flip=True):
        fwd = apply_affine_to_boxes(m, box)
        back = unwarp_boxes(m, fwd)
        np.testing.assert_allclose(back, box, atol=1e-6)
        if flipped:
            # mirrored warp: x-scale negative
            assert m[0, 0] < 0


def test_numpy_nms():
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float64
    )
    scores = np.array([0.9, 0.8, 0.95])
    keep = numpy_nms(boxes, scores, 0.5)
    assert list(keep) == [2, 0]


def test_trainer_tta_dispatches_through_factory():
    """DefaultTrainer.test_with_TTA builds its predictor via the
    build_tta_predictor classmethod so projects can swap the merge
    protocol (reference densepose/engine/trainer.py overrides
    test_with_TTA to use DensePoseGeneralizedRCNNWithTTA)."""
    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.data import DatasetCatalog
    from detectron2_centernet_tpu.engine import DefaultTrainer

    name = "_tta_dispatch_ds"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: [
        {"image_id": 0, "height": 8, "width": 8,
         "image": np.zeros((8, 8, 3), np.uint8)},
    ])

    calls = {}

    class StubEvaluator:
        def reset(self):
            calls["reset"] = True

        def process(self, inputs, outputs):
            calls["processed"] = (inputs[0]["image_id"], outputs[0])

        def evaluate(self):
            return {"stub": {"metric": 1.0}}

    class StubModel:
        variables = {"params": {}}

    class T(DefaultTrainer):
        def __init__(self):  # never construct state
            pass

        @classmethod
        def build_evaluator(cls, cfg, dataset_name):
            return StubEvaluator()

        @classmethod
        def build_tta_predictor(cls, cfg, model, variables):
            calls["factory"] = (model, variables)
            return lambda image: {"instances": "stub-instances"}

    cfg = get_cfg()
    cfg.DATASETS.TEST = (name,)
    res = T.test_with_TTA(cfg, StubModel())
    assert calls["factory"][0].__class__ is StubModel
    assert calls["processed"] == (0, {"instances": "stub-instances"})
    assert res == {"stub": {"metric": 1.0}}
