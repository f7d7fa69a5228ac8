"""VOC evaluation golden parity: our evaluator's per-class AP vs the
reference's OWN voc_eval (pascal_voc_evaluation.py:186-290), fed through
synthesized annotation XMLs + detection files on disk."""

import numpy as np
import pytest


def _write_voc_fixture(tmp_path, rng, n_imgs=6, cls="car"):
    """Random gt boxes (some difficult) + noisy detections; returns
    (annopath_tpl, imagesetfile, detfile_tpl, gt_by_img, dets)."""
    anno_dir = tmp_path / "Annotations"
    anno_dir.mkdir()
    gt_by_img = {}
    dets = []
    names = [f"img{i:03d}" for i in range(n_imgs)]
    for name in names:
        k = rng.randint(1, 4)
        boxes = np.round(rng.rand(k, 4) * 200).astype(np.float64)
        boxes[:, 2:] = boxes[:, :2] + 20 + np.round(rng.rand(k, 2) * 80)
        difficult = rng.rand(k) < 0.25
        gt_by_img[name] = (boxes, difficult)
        objs = "".join(
            f"""
  <object><name>{cls}</name><pose>Left</pose><truncated>0</truncated>
  <difficult>{int(d)}</difficult>
  <bndbox><xmin>{int(b[0])}</xmin><ymin>{int(b[1])}</ymin><xmax>{int(b[2])}</xmax><ymax>{int(b[3])}</ymax></bndbox></object>"""
            for b, d in zip(boxes, difficult)
        )
        (anno_dir / f"{name}.xml").write_text(
            f"<annotation><filename>{name}</filename>{objs}</annotation>"
        )
        # detections: jittered copies of gt + pure noise
        for b in boxes:
            if rng.rand() < 0.85:
                jit = b + rng.randn(4) * 6
                dets.append((name, float(rng.rand() * 0.5 + 0.5), jit))
        for _ in range(rng.randint(0, 3)):
            nb = rng.rand(4) * 200
            nb[2:] = nb[:2] + 30
            dets.append((name, float(rng.rand() * 0.6), nb))

    setfile = tmp_path / "test.txt"
    setfile.write_text("\n".join(names) + "\n")
    detfile = tmp_path / "det_{:s}.txt"
    with open(str(detfile).format(cls), "w") as f:
        for name, score, b in dets:
            # the reference reads 1-based coords and subtracts 1
            f.write(
                f"{name} {score:.6f} {b[0] + 1:.1f} {b[1] + 1:.1f} {b[2] + 1:.1f} {b[3] + 1:.1f}\n"
            )
    return str(anno_dir / "{}.xml"), str(setfile), str(detfile), gt_by_img, dets


@pytest.mark.parametrize("use_07", [False, True])
def test_voc_eval_class_parity(ref_full, tmp_path, use_07):
    import importlib
    import sys

    data_pkg = sys.modules["detectron2.data"]
    if not hasattr(data_pkg, "MetadataCatalog"):
        catalog = importlib.import_module("detectron2.data.catalog")
        data_pkg.MetadataCatalog = catalog.MetadataCatalog
    ref_voc = importlib.import_module("detectron2.evaluation.pascal_voc_evaluation")
    from detectron2_centernet_tpu.evaluation.pascal_voc_evaluation import (
        _voc_eval_class,
    )

    rng = np.random.RandomState(7)
    annopath, setfile, detfile, gt_by_img, dets = _write_voc_fixture(tmp_path, rng)
    _, _, ap_ref = ref_voc.voc_eval(
        detfile, annopath, setfile, "car", ovthresh=0.5, use_07_metric=use_07
    )
    ap = _voc_eval_class(gt_by_img, dets, iou_thresh=0.5, use_07=use_07)
    np.testing.assert_allclose(ap, ap_ref, atol=1e-8)
