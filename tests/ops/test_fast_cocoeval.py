"""C++ fast cocoeval parity against the numpy reference implementation
(the contract test pattern of reference tests/data/test_coco_evaluation.py,
which checks COCOeval_opt == pycocotools COCOeval)."""

import numpy as np
import pytest

from detectron2_centernet_tpu.evaluation.cocoeval_np import COCOEval

fast = pytest.importorskip("detectron2_centernet_tpu.ops.fast_cocoeval")


def _random_case(seed, n_imgs=6, n_cats=3):
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for img in range(n_imgs):
        for _ in range(rng.randint(0, 8)):
            cat = int(rng.randint(1, n_cats + 1))
            x, y = rng.rand(2) * 200
            w, h = rng.rand(2) * 80 + 4
            gts.append(
                {
                    "image_id": img,
                    "category_id": cat,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "iscrowd": int(rng.rand() < 0.1),
                }
            )
        for _ in range(rng.randint(0, 12)):
            cat = int(rng.randint(1, n_cats + 1))
            x, y = rng.rand(2) * 200
            w, h = rng.rand(2) * 80 + 4
            dts.append(
                {
                    "image_id": img,
                    "category_id": cat,
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "score": float(rng.rand()),
                }
            )
        # some dts that exactly match a gt
        if gts and rng.rand() < 0.8:
            g = gts[rng.randint(len(gts))]
            dts.append(
                {
                    "image_id": g["image_id"],
                    "category_id": g["category_id"],
                    "bbox": list(g["bbox"]),
                    "score": float(rng.rand() * 0.5 + 0.5),
                }
            )
    return gts, dts, list(range(n_imgs)), list(range(1, n_cats + 1))


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_fast_matches_numpy(seed):
    gts, dts, img_ids, cat_ids = _random_case(seed)
    ref = COCOEval(gts, dts, img_ids, cat_ids)
    ref.evaluate()
    ref_stats = ref.summarize()

    f = fast.FastCOCOEval(gts, dts, img_ids, cat_ids)
    f.evaluate()
    fast_stats = f.summarize()

    np.testing.assert_allclose(fast_stats, ref_stats, atol=1e-9)
    np.testing.assert_allclose(
        f.eval["precision"], ref.eval["precision"], atol=1e-9
    )
    np.testing.assert_allclose(f.eval["recall"], ref.eval["recall"], atol=1e-9)


def test_fast_empty_detections():
    gts, dts, img_ids, cat_ids = _random_case(3)
    f = fast.FastCOCOEval(gts, [], img_ids, cat_ids)
    f.evaluate()
    stats = f.summarize()
    assert stats[0] <= 0.0  # no detections -> AP 0 (or -1 if no gts)
