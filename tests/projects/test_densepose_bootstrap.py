"""DensePose bootstrapping pipeline (reference samplers/ +
inference_based_loader.py): teacher predictions -> packed pseudo gt.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose"))

from densepose_tpu import (  # noqa: E402
    CombinedDataLoader,
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    InferenceBasedLoader,
    MaskFromDensePoseSampler,
    ScoreBasedFilter,
)


def _fake_pred(k=3, s=16, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 25, (k, s, s)).astype(np.uint8)
    return {
        "boxes": rng.rand(k, 4).astype(np.float32) * 64,
        "scores": np.asarray([0.9, 0.5, 0.95], np.float32)[:k],
        "dp_labels": labels,
        "dp_u": rng.rand(k, s, s).astype(np.float32),
        "dp_v": rng.rand(k, s, s).astype(np.float32),
        "dp_sigma_2": rng.rand(k, s, s).astype(np.float32) + 0.01,
    }


def test_uniform_sampler_packs_valid_points():
    pred = _fake_pred()
    out = DensePoseUniformSampler(count_per_class=2)(pred, max_objs=4, max_points=48)
    assert out["gt_dp_x"].shape == (4, 48)
    valid = out["gt_dp_valid"]
    assert valid.sum() > 0
    # sampled coords live in the 256-normalized box frame
    assert (out["gt_dp_x"][valid > 0] >= 0).all()
    assert (out["gt_dp_x"][valid > 0] <= 256).all()
    # part ids in [1, 24]; U/V in [0, 1]
    ids = out["gt_dp_I"][valid > 0]
    assert ids.min() >= 1 and ids.max() <= 24
    assert (out["gt_dp_U"][valid > 0] <= 1).all()
    # U values come from the predicted raster at the sampled texel
    i = 0
    s = pred["dp_labels"].shape[-1]
    for j in range(int(valid[i].sum())):
        x, y = out["gt_dp_x"][i, j], out["gt_dp_y"][i, j]
        xx, yy = int(x / 256 * s), int(y / 256 * s)
        assert pred["dp_labels"][i, yy, xx] == out["gt_dp_I"][i, j]
        np.testing.assert_allclose(pred["dp_u"][i, yy, xx], out["gt_dp_U"][i, j])


def test_confidence_sampler_prefers_low_sigma():
    """With search == count the selection is exactly the most confident
    (lowest sigma^2) texels of each part."""
    s = 16
    rng = np.random.RandomState(1)
    pred = _fake_pred(k=1, s=s)
    pred["dp_labels"][:] = 1  # one part everywhere
    sig = rng.rand(1, s, s).astype(np.float32)
    pred["dp_sigma_2"] = sig
    smp = DensePoseConfidenceBasedSampler(
        "dp_sigma_2", count_per_class=8, search_count_multiplier=1.0
    )
    out = smp(pred, max_objs=1, max_points=32)
    got_sig = []
    for j in range(8):
        x, y = out["gt_dp_x"][0, j], out["gt_dp_y"][0, j]
        got_sig.append(sig[0, int(y / 256 * s), int(x / 256 * s)])
    np.testing.assert_allclose(
        sorted(got_sig), np.sort(sig.ravel())[:8], rtol=1e-6
    )


def test_score_filter_and_inference_based_loader():
    preds = {k: v[None] for k, v in _fake_pred().items()}  # batch of 1

    def predict(images):
        return preds

    images = [np.zeros((1, 32, 32, 3), np.float32)]
    loader = InferenceBasedLoader(
        predict, images, DensePoseUniformSampler(2),
        data_filter=ScoreBasedFilter(min_score=0.8),
        max_objs=4, max_points=16,
    )
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    # detections 0 and 2 pass the 0.8 score filter
    assert b["gt_valid"][0].sum() == 2
    assert b["gt_boxes"].shape == (1, 4, 4)
    assert b["gt_dp_x"].shape == (1, 4, 16)
    assert b["gt_dp_valid"].sum() > 0


def test_mask_from_densepose_sampler():
    pred = _fake_pred(k=2, s=16)
    pred["dp_labels"][0, :, :] = 0
    pred["dp_labels"][0, :8, :] = 3
    masks = MaskFromDensePoseSampler(raster=8)(pred, max_objs=3)
    assert masks.shape == (3, 8, 8)
    assert masks[0, :4].all() and not masks[0, 4:].any()


def test_mask_sampler_non_multiple_raster():
    """HEATMAP_SIZE=112 labels with the default raster=64 must cover the
    whole raster (not crop the top-left corner), and rasters larger than the
    label grid must upsample instead of raising."""
    pred = _fake_pred(k=1, s=112)
    pred["dp_labels"][0, :, :] = 0
    pred["dp_labels"][0, 56:, 56:] = 5  # bottom-right quadrant only
    masks = MaskFromDensePoseSampler(raster=64)(pred, max_objs=1)
    assert masks.shape == (1, 64, 64)
    # bottom-right quadrant foreground survives; top-left stays empty
    assert masks[0, 33:, 33:].all()
    assert not masks[0, :31, :31].any()

    tiny = _fake_pred(k=1, s=4)
    tiny["dp_labels"][0, :, :] = 0
    tiny["dp_labels"][0, 2:, :] = 1
    up = MaskFromDensePoseSampler(raster=8)(tiny, max_objs=1)
    assert up.shape == (1, 8, 8)
    assert up[0, 4:].all() and not up[0, :4].any()


def test_video_keyframe_dataset_batched_transform(tmp_path):
    """The per-video transform receives the stacked (N, H, W, 3) batch, as
    ImageResizeTransform expects."""
    import cv2

    from densepose_tpu import ImageResizeTransform, VideoKeyframeDataset

    path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (32, 24)
    )
    if not writer.isOpened():  # codec unavailable in this env
        import pytest

        pytest.skip("no MJPG codec available")
    for i in range(4):
        writer.write(np.full((24, 32, 3), i * 40, np.uint8))
    writer.release()

    ds = VideoKeyframeDataset(
        [path], transform=ImageResizeTransform(min_size=12, max_size=16)
    )
    frames = ds[0]
    assert len(frames) == 4
    for f in frames:
        assert f.dtype == np.float32
        assert f.shape == (12, 16, 3)


def test_combined_loader_ratios():
    a, b = [1, 1, 1], [2, 2, 2]
    combined = CombinedDataLoader([a, b], ratios=[0.5, 0.5], seed=0)
    it = iter(combined)
    vals = [next(it) for _ in range(50)]
    assert set(vals) == {1, 2}


def test_category_retargeting():
    """The evolution configs' category remap: whitelist + map applied per
    dataset (reference build.py:214-258)."""
    from densepose_tpu.data import combine_detection_dataset_dicts

    from detectron2_centernet_tpu.config import CfgNode as CN
    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog

    name = "_retarget_test_ds"
    if name in DatasetCatalog.list():
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: [
        {"image_id": 0, "annotations": [
            {"category_id": 16, "bbox": [0, 0, 1, 1]},   # dog -> person
            {"category_id": 3, "bbox": [0, 0, 1, 1]},    # dropped
        ]},
    ])

    cfg = CN()
    cfg.DATASETS = CN()
    cfg.DATASETS.CATEGORY_MAPS = CN(new_allowed=True)
    cfg.DATASETS.CATEGORY_MAPS[name] = CN(new_allowed=True)
    cfg.DATASETS.CATEGORY_MAPS[name]["16"] = 1
    cfg.DATASETS.WHITELISTED_CATEGORIES = CN(new_allowed=True)
    cfg.DATASETS.WHITELISTED_CATEGORIES[name] = [16]

    dicts = combine_detection_dataset_dicts([name], cfg)
    anns = dicts[0]["annotations"]
    assert len(anns) == 1
    assert anns[0]["category_id"] == 1
    assert MetadataCatalog.get(name).category_map == {16: 1}
