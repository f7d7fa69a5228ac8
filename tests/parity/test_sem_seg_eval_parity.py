"""Sem-seg evaluator golden parity: identical predictions + gt PNGs fed to
both our SemSegEvaluator and the reference's own (sem_seg_evaluation.py:
19-129); mIoU/fwIoU/mACC/pACC must agree."""

import numpy as np
import pytest


def test_sem_seg_evaluator_parity(ref_full, tmp_path):
    import importlib
    import sys

    torch = ref_full.torch
    PIL_Image = pytest.importorskip("PIL.Image")

    data_pkg = sys.modules["detectron2.data"]
    if not hasattr(data_pkg, "MetadataCatalog"):
        catalog = importlib.import_module("detectron2.data.catalog")
        data_pkg.MetadataCatalog = catalog.MetadataCatalog
    if not hasattr(data_pkg, "DatasetCatalog"):
        data_pkg.DatasetCatalog = ref_full.catalog.DatasetCatalog
    ref_ss = importlib.import_module("detectron2.evaluation.sem_seg_evaluation")

    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.evaluation.sem_seg_evaluation import (
        SemSegEvaluator,
    )

    rng = np.random.RandomState(3)
    n_imgs, h, w, ncls, ignore = 4, 32, 48, 5, 255
    records, preds = [], []
    for i in range(n_imgs):
        gt = rng.randint(0, ncls, (h, w)).astype(np.uint8)
        gt[rng.rand(h, w) < 0.1] = ignore  # ignore regions
        f = tmp_path / f"gt{i}.png"
        PIL_Image.fromarray(gt).save(f)
        records.append(
            {
                "file_name": f"im{i}.jpg",
                "sem_seg_file_name": str(f),
                "image_id": i,
                "height": h,
                "width": w,
            }
        )
        # noisy predictions correlated with gt
        p = gt.astype(np.int64).copy()
        p[p == ignore] = 0
        flip = rng.rand(h, w) < 0.3
        p[flip] = rng.randint(0, ncls, flip.sum())
        preds.append(p)

    # reference evaluator over its own catalog
    name = "_semseg_parity"
    ref_full.catalog.DatasetCatalog.register(name, lambda: records)
    ref_full.catalog.MetadataCatalog.get(name).set(
        stuff_classes=[str(c) for c in range(ncls)], ignore_label=ignore
    )
    try:
        t = ref_ss.SemSegEvaluator(
            name, distributed=False, num_classes=ncls, ignore_label=ignore
        )
        t.reset()
        # the JSON dump path needs pycocotools RLE (absent); the golden
        # compares the confusion-matrix metrics only
        t.encode_json_sem_seg = lambda *a, **k: []
        for rec, p in zip(records, preds):
            # reference takes (C, H, W) logits-like; argmax(dim=0) == p
            onehot = torch.zeros(ncls, h, w)
            onehot[
                torch.from_numpy(p),
                torch.arange(h)[:, None].expand(h, w),
                torch.arange(w)[None, :].expand(h, w),
            ] = 1.0
            t.process([{"file_name": rec["file_name"]}], [{"sem_seg": onehot}])
        want = t.evaluate()["sem_seg"]
    finally:
        ref_full.catalog.DatasetCatalog.remove(name)

    # our evaluator over our catalog
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(ignore_label=ignore, stuff_classes=[str(c) for c in range(ncls)])
    try:
        m = SemSegEvaluator(name, num_classes=ncls, ignore_label=ignore)
        m.reset()
        for rec, p in zip(records, preds):
            m.process([{"image_id": rec["image_id"]}], [{"sem_seg": p}])
        got = m.evaluate()["sem_seg"]
    finally:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)

    for k in ("mIoU", "fwIoU", "mACC", "pACC"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)
