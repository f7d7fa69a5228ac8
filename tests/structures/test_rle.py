"""RLE codec + mask IoU."""

import numpy as np

from detectron2_centernet_tpu.structures.rle import (
    mask_to_rle,
    rle_area,
    rle_iou,
    rle_to_mask,
)


def test_rle_round_trip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = rng.rand(13, 17) > 0.6
        rle = mask_to_rle(m)
        np.testing.assert_array_equal(rle_to_mask(rle), m)
        assert rle_area(rle) == m.sum()
    # all-true / all-false edges
    for m in (np.ones((4, 4), bool), np.zeros((4, 4), bool)):
        np.testing.assert_array_equal(rle_to_mask(mask_to_rle(m)), m)


def test_rle_iou_matches_dense():
    rng = np.random.RandomState(1)
    dets = [mask_to_rle(rng.rand(20, 20) > 0.5) for _ in range(3)]
    gts = [mask_to_rle(rng.rand(20, 20) > 0.5) for _ in range(2)]
    got = rle_iou(dets, gts, [0, 0])
    for i, d in enumerate(dets):
        for j, g in enumerate(gts):
            dm, gm = rle_to_mask(d), rle_to_mask(g)
            inter = (dm & gm).sum()
            union = (dm | gm).sum()
            np.testing.assert_allclose(got[i, j], inter / union)
    # crowd: denominator is det area
    got_c = rle_iou(dets, gts, [0, 1])
    dm, gm = rle_to_mask(dets[0]), rle_to_mask(gts[1])
    np.testing.assert_allclose(got_c[0, 1], (dm & gm).sum() / dm.sum())


def test_segm_cocoeval_perfect():
    from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval

    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    rle = mask_to_rle(m)
    gt = [{"image_id": 1, "category_id": 1, "segmentation": rle, "iscrowd": 0}]
    dt = [{"image_id": 1, "category_id": 1, "segmentation": rle, "score": 0.9}]
    ev = COCOEval(gt, dt, [1], [1], iou_type="segm")
    ev.evaluate()
    stats = ev.summarize()
    assert stats[0] == 1.0
