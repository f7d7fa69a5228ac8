"""SemSegEvaluator confusion math + PQ computation."""

import numpy as np

from detectron2_centernet_tpu.evaluation.panoptic_evaluation import (
    PanopticEvaluator,
    pq_compute_single_image,
)


def test_pq_perfect_match():
    pan = np.zeros((10, 10), np.int32)
    pan[:5] = 1
    pan[5:] = 2
    segs = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 7}]
    stats = pq_compute_single_image(pan, segs, pan.copy(), [dict(s) for s in segs])
    ev = PanopticEvaluator()
    ev.update(stats)
    out = ev.summarize()
    assert out["PQ"] == 100.0 and out["SQ"] == 100.0 and out["RQ"] == 100.0


def test_pq_partial_overlap_and_fp():
    gt = np.zeros((10, 10), np.int32)
    gt[:, :6] = 1  # area 60
    pred = np.zeros((10, 10), np.int32)
    pred[:, :8] = 1  # area 80, inter 60, union 80 -> iou 0.75
    pred[:, 8:] = 2  # spurious segment (void-overlap 20/20 > 0.5 -> not FP)
    stats = pq_compute_single_image(
        gt, [{"id": 1, "category_id": 0}],
        pred, [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 0}],
    )
    ev = PanopticEvaluator()
    ev.update(stats)
    out = ev.summarize()
    np.testing.assert_allclose(out["SQ"], 75.0)
    np.testing.assert_allclose(out["RQ"], 100.0)

    # a real FP (overlapping gt area of another class, not void)
    pred2 = np.zeros((10, 10), np.int32)
    pred2[:, :6] = 1
    pred2[:, 6:] = 2
    gt2 = np.zeros((10, 10), np.int32)
    gt2[:, :6] = 1
    gt2[:, 6:] = 3
    stats2 = pq_compute_single_image(
        gt2, [{"id": 1, "category_id": 0}, {"id": 3, "category_id": 1}],
        pred2, [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 5}],
    )
    ev2 = PanopticEvaluator()
    ev2.update(stats2)
    out2 = ev2.summarize()
    # cat 0: TP iou 1.0; cat 5: FP; cat 1: FN
    assert out2["RQ"] < 100.0


def test_sem_seg_evaluator_math(tmp_path):
    from PIL import Image

    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.evaluation import SemSegEvaluator

    gt = np.zeros((8, 8), np.uint8)
    gt[:, 4:] = 1
    gt_path = str(tmp_path / "gt.png")
    Image.fromarray(gt).save(gt_path)
    name = "_semseg_test"
    DatasetCatalog.register(
        name, lambda: [{"image_id": 1, "sem_seg_file_name": gt_path,
                        "file_name": "x.png", "height": 8, "width": 8}]
    )
    MetadataCatalog.get(name).set(stuff_classes=["a", "b"], ignore_label=255)
    try:
        ev = SemSegEvaluator(name)
        ev.reset()
        pred = np.zeros((8, 8), np.int64)
        pred[:, 2:] = 1  # class1: inter 32, union 48 -> IoU 2/3; class0: 16/32
        ev.process([{"image_id": 1}], [{"sem_seg": pred}])
        res = ev.evaluate()["sem_seg"]
        np.testing.assert_allclose(res["mIoU"], 100 * (0.5 + 2 / 3) / 2, rtol=1e-6)
        np.testing.assert_allclose(res["pACC"], 100 * 48 / 64, rtol=1e-6)
    finally:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
