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


def test_compressed_counts_roundtrip():
    from detectron2_centernet_tpu.structures.rle import (
        decode_counts,
        encode_counts,
        ensure_uncompressed,
    )

    rng = np.random.RandomState(2)
    for _ in range(10):
        m = rng.rand(31, 23) > 0.7
        counts = mask_to_rle(m)["counts"]
        s = encode_counts(counts)
        assert isinstance(s, str)
        assert decode_counts(s) == counts
        # string- and bytes-counts dicts normalize to the same mask
        h, w = m.shape
        for payload in (s, s.encode("ascii")):
            rle_c = {"size": [h, w], "counts": payload}
            assert ensure_uncompressed(rle_c)["counts"] == counts
            np.testing.assert_array_equal(rle_to_mask(rle_c), m)
            assert rle_area(rle_c) == m.sum()


def test_compressed_counts_known_value():
    """Hand-derived vectors for the pycocotools rleToString format (5 data
    bits/char, +48 offset, counts[i] delta-coded against counts[i-2] for
    i>2): [3,2,2,2] -> chars (3, 2, 2, 2-2=0) -> '3220'."""
    from detectron2_centernet_tpu.structures.rle import decode_counts, encode_counts

    counts = [3, 2, 2, 2]
    s = encode_counts(counts)
    assert s == "3220"
    assert decode_counts(s) == counts
    # 100 needs multi-char LEB: 100 = 0b1100100 -> low5=00100|more ->
    # chr(4+32+48)='T', high bits 0b11=3 -> chr(3+48)='3'
    assert encode_counts([100]) == "T3"
    assert decode_counts("T3") == [100]
    # negative deltas exercise the sign-extension branch
    counts2 = [0, 100, 1, 1, 50, 3]
    assert decode_counts(encode_counts(counts2)) == counts2


def test_segm_eval_with_compressed_crowd_gt():
    """COCO crowd ground truth ships compressed string counts; segm eval must
    ingest them (ADVICE round 1, medium)."""
    from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval
    from detectron2_centernet_tpu.structures.rle import encode_counts

    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    rle = mask_to_rle(m)
    crowd_m = np.zeros((20, 20), bool)
    crowd_m[0:4, 0:4] = True
    crowd_rle_list = mask_to_rle(crowd_m)
    crowd_rle = {
        "size": crowd_rle_list["size"],
        "counts": encode_counts(crowd_rle_list["counts"]),
    }
    gt = [
        {"image_id": 1, "category_id": 1, "segmentation": rle, "iscrowd": 0},
        {"image_id": 1, "category_id": 1, "segmentation": crowd_rle, "iscrowd": 1},
    ]
    dt = [{"image_id": 1, "category_id": 1, "segmentation": rle, "score": 0.9}]
    ev = COCOEval(gt, dt, [1], [1], iou_type="segm")
    ev.evaluate()
    stats = ev.summarize()
    assert stats[0] == 1.0
