"""DensePose DB tooling: EntrySelector, DensePoseDataRelative, GT
visualizers, frame selectors, image datasets, and the query_db CLI.

Reference behaviors covered: ``densepose/utils/dbhelper.py`` (selector
grammar), ``densepose/data/structures.py:68-230`` (annotation container +
hflip label symmetry), ``densepose/vis/densepose.py:498-593`` (GT
visualizers), ``densepose/data/video/frame_selector.py``,
``densepose/data/transform/image.py``, ``data/image_list_dataset.py``,
and ``query_db.py`` print/show actions.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_DP_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose")
sys.path.insert(0, _DP_ROOT)

from densepose_tpu import (  # noqa: E402
    DensePoseDataRelative,
    EntrySelector,
    FirstKFramesSelector,
    FrameSelectionStrategy,
    ImageListDataset,
    ImageResizeTransform,
    LastKFramesSelector,
    RandomKFramesSelector,
    build_frame_selector,
)
from densepose_tpu.vis import (  # noqa: E402
    DensePoseDataCoarseSegmentationVisualizer,
    DensePoseDataPointsIVisualizer,
    DensePoseDataPointsUVisualizer,
    DensePoseDataPointsVisualizer,
)
from detectron2_centernet_tpu.structures.rle import mask_to_rle  # noqa: E402


# ---------------------------------------------------------------- dbhelper
def test_entry_selector_all():
    sel = EntrySelector.from_string("*")
    assert sel({"anything": 1}) and sel({})


def test_entry_selector_equality_and_type():
    sel = EntrySelector.from_string("image_id:int=7")
    assert sel({"image_id": 7})
    assert not sel({"image_id": 8})
    # untyped comparisons are string-typed (reference _FieldEntryValuePredicate
    # defaults the type to str)
    sel = EntrySelector.from_string("file_name=a.jpg")
    assert sel({"file_name": "a.jpg"}) and not sel({"file_name": "b.jpg"})


def test_entry_selector_range_and_conjunction():
    sel = EntrySelector.from_string("image_id:int=3-5,height:int=10")
    assert sel({"image_id": 4, "height": 10})
    assert not sel({"image_id": 6, "height": 10})
    assert not sel({"image_id": 4, "height": 11})


def test_entry_selector_parse_errors():
    for bad in ("=3", "noequals", "image_id:int"):
        with pytest.raises(ValueError):
            EntrySelector.from_string(bad)


# ------------------------------------------------- DensePoseDataRelative
def _annotation(n_pts=3):
    rng = np.random.RandomState(0)
    segm = np.zeros((256, 256), np.uint8)
    segm[:128] = 1  # part 1 occupies the top half
    return {
        "bbox": [4.0, 6.0, 40.0, 60.0],
        "dp_x": rng.uniform(0, 255, n_pts).tolist(),
        "dp_y": rng.uniform(0, 255, n_pts).tolist(),
        "dp_I": [1, 3, 24][:n_pts],
        "dp_U": rng.uniform(0, 1, n_pts).tolist(),
        "dp_V": rng.uniform(0, 1, n_pts).tolist(),
        "dp_masks": [mask_to_rle(segm > 0)] + [None] * 13,
    }


def test_data_relative_decodes_points_and_segm():
    ann = _annotation()
    dp = DensePoseDataRelative(ann)
    assert dp.x.shape == (3,) and dp.segm.shape == (256, 256)
    # part rasters paint part_id + 1 (reference extract_segmentation_mask)
    assert set(np.unique(dp.segm)) == {0.0, 1.0}
    assert (dp.segm[:128] == 1).all() and (dp.segm[128:] == 0).all()


def test_data_relative_validate_and_cleanup():
    ann = _annotation()
    del ann["dp_U"]
    ok, reason = DensePoseDataRelative.validate_annotation(ann)
    assert not ok and "dp_U" in reason
    ann = _annotation()
    DensePoseDataRelative(ann, cleanup=True)
    assert "dp_x" not in ann and "bbox" in ann


def test_data_relative_hflip_symmetry():
    ann = _annotation()
    # left-hand part 3 sits in the segm raster's left half as mask label 2
    ann["dp_masks"] = [None] * 13
    left = np.zeros((256, 256), np.uint8)
    left[:, :128] = 1
    ann["dp_masks"] = [None, mask_to_rle(left > 0)] + [None] * 12
    dp = DensePoseDataRelative(ann)
    x0 = dp.x.copy()
    dp.apply_hflip()
    np.testing.assert_allclose(dp.x, 256.0 - x0)
    # point labels 3<->4 swap, 1 fixed, 24<->23 (reference POINT_LABEL_SYMMETRIES)
    assert dp.i.tolist() == [1.0, 4.0, 23.0]
    # mask label 2 -> 3 on the mirrored (right) half (MASK_LABEL_SYMMETRIES)
    assert (dp.segm[:, 128:] == 3).all() and (dp.segm[:, :128] == 0).all()


# ------------------------------------------------------- GT visualizers
def test_gt_visualizers_render():
    ann = _annotation()
    dp = DensePoseDataRelative(ann)
    boxes = [np.asarray(ann["bbox"])]
    image = np.zeros((80, 60, 3), np.uint8)
    for vis in (
        DensePoseDataCoarseSegmentationVisualizer(),
        DensePoseDataPointsVisualizer(),
        DensePoseDataPointsUVisualizer(),
        DensePoseDataPointsIVisualizer(),
    ):
        out = vis.visualize(image.copy(), (boxes, [dp]))
        assert out.shape == image.shape
        assert out.any(), type(vis).__name__
        # nothing painted outside the (generous) box neighborhood
        assert not out[:2].any()
    # None data is a no-op
    assert not DensePoseDataPointsVisualizer().visualize(image.copy(), None).any()


# ------------------------------------------------ frame selectors / data
def test_frame_selectors():
    tss = list(range(10))
    assert FirstKFramesSelector(3)(tss) == [0, 1, 2]
    assert LastKFramesSelector(3)(tss) == [7, 8, 9]
    got = RandomKFramesSelector(4)(tss)
    assert len(got) == 4 and len(set(got)) == 4 and set(got) <= set(tss)
    assert len(RandomKFramesSelector(99)(tss)) == 10
    assert build_frame_selector(FrameSelectionStrategy.ALL)(tss) == tss
    assert build_frame_selector(FrameSelectionStrategy.FIRST_K, 2)(tss) == [0, 1]


def test_image_resize_transform_aspect_and_bounds():
    frames = np.random.randint(0, 255, (2, 100, 200, 3), np.uint8)
    out = ImageResizeTransform(min_size=50, max_size=80)(frames)
    # scale = min(50/100, 80/200) = 0.4 -> 40 x 80
    assert out.shape == (2, 40, 80, 3) and out.dtype == np.float32


def test_image_list_dataset(tmp_path):
    from PIL import Image

    p = tmp_path / "im.png"
    Image.fromarray(np.full((8, 6, 3), 37, np.uint8)).save(p)
    ds = ImageListDataset([str(p), str(tmp_path / "missing.png")])
    assert len(ds) == 2
    assert ds[0].shape == (8, 6, 3)
    # unreadable file -> empty sentinel, not an exception
    assert ds[1].shape == (1, 1, 3)
    # scale = min(4/6, 100/8) = 2/3 -> 8x6 image resizes to 5x4
    ds_t = ImageListDataset([str(p)], transform=ImageResizeTransform(4, 100))
    assert ds_t[0].shape == (5, 4, 3)


# ------------------------------------------------------------- query_db
def _write_dataset(tmp_path):
    """A one-image dataset registered through a tiny conftest-free script."""
    from PIL import Image

    img = tmp_path / "q.png"
    Image.fromarray(np.full((64, 48, 3), 99, np.uint8)).save(img)
    return img


def test_query_db_print_and_show(tmp_path):
    img_path = _write_dataset(tmp_path)
    ann = _annotation()
    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.argv = [sys.argv[0]] + sys.argv[1:]
import numpy as np
from detectron2_centernet_tpu.data import DatasetCatalog
ann = {ann!r}
DatasetCatalog.register("_qdb_ds", lambda: [
    {{"image_id": 3, "file_name": {str(img_path)!r}, "height": 64, "width": 48,
      "annotations": [ann]}},
    {{"image_id": 9, "file_name": {str(img_path)!r}, "height": 64, "width": 48,
      "annotations": []}},
])
import query_db
query_db.main()
"""
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=_DP_ROOT + os.pathsep + os.environ.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, str(driver), "print", "_qdb_ds", "image_id:int=3"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "'image_id': 3" in out.stdout
    assert "'image_id': 9" not in out.stdout

    out_png = tmp_path / "vis.png"
    out = subprocess.run(
        [sys.executable, str(driver), "show", "_qdb_ds", "*",
         "dp_segm,dp_pts,bbox", "--output", str(out_png)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    # entry 2 has no valid dp annotations -> still rendered (boxes only)
    assert (tmp_path / "vis.0001.png").exists()
    assert (tmp_path / "vis.0002.png").exists()
