"""DensePoseTransformData: the external UV chart-symmetry lookup
(reference data/structures.py:11-64 + _flip_iuv_semantics :194-208) and
its wiring through the flip paths (annotation hflip, raster un-flip,
mapper mirrored samples).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose"))

from densepose_tpu import (  # noqa: E402
    DensePoseDataRelative,
    DensePoseDatasetMapper,
    DensePoseTransformData,
    POINT_LABEL_SYMMETRIES,
    load_for_dataset,
)
from densepose_tpu.tta import flip_iuv_raster  # noqa: E402
from detectron2_centernet_tpu.data import MetadataCatalog  # noqa: E402

from .test_densepose import _cfg  # noqa: E402


def _toy_transform_data() -> DensePoseTransformData:
    """U' = 1 - u for every part; V' = v/2 for part 1, identity elsewhere
    — distinguishable per-part tables on the reference's (24, 256, 256)
    layout."""
    grid = np.arange(256, dtype=np.float32) / 255.0
    u_t = np.tile((1.0 - grid)[None, None, :], (24, 256, 1))
    v_t = np.tile(grid[None, :, None], (24, 1, 256))
    v_t[0] = v_t[0] / 2.0
    return DensePoseTransformData(
        {"U_transforms": u_t, "V_transforms": v_t}
    )


def _save_mat(path: str) -> None:
    """Write the toy tables in the reference's .mat layout: (1, 24) object
    cells of (256, 256) arrays."""
    import scipy.io

    td = _toy_transform_data()
    cells_u = np.empty((1, 24), object)
    cells_v = np.empty((1, 24), object)
    for i in range(24):
        cells_u[0, i] = td.uv_symmetries["U_transforms"][i]
        cells_v[0, i] = td.uv_symmetries["V_transforms"][i]
    scipy.io.savemat(path, {"U_transforms": cells_u, "V_transforms": cells_v})


def test_load_mat_roundtrip(tmp_path):
    p = str(tmp_path / "uv_sym.mat")
    _save_mat(p)
    td = DensePoseTransformData.load(p)
    assert td.uv_symmetries["U_transforms"].shape == (24, 256, 256)
    ref = _toy_transform_data()
    np.testing.assert_allclose(
        td.uv_symmetries["V_transforms"], ref.uv_symmetries["V_transforms"]
    )
    assert td.point_label_symmetries == POINT_LABEL_SYMMETRIES


def test_apply_uv_indexes_by_pre_swap_label():
    td = _toy_transform_data()
    i_old = np.array([1, 2, 0])
    u = np.array([0.25, 0.8, 0.3], np.float32)
    v = np.array([1.0, 0.5, 0.9], np.float32)
    u2, v2 = td.apply_uv(i_old, u, v)
    # u -> 1 - u (all parts); v -> v/2 only for part 1; background untouched.
    # Texel indices truncate (reference's .long()), hence floor below.
    np.testing.assert_allclose(u2[:2], 1.0 - np.floor(u[:2] * 255) / 255, atol=1e-6)
    np.testing.assert_allclose(v2[0], np.floor(v[0] * 255) / 255 / 2.0, atol=1e-6)
    np.testing.assert_allclose(v2[1], np.floor(v[1] * 255) / 255, atol=1e-6)
    assert u2[2] == u[2] and v2[2] == v[2]


def test_annotation_hflip_remaps_uv():
    segm = np.zeros((256, 256), np.float32)
    ann = {
        "dp_x": [64.0], "dp_y": [32.0], "dp_I": [3], "dp_U": [0.25],
        "dp_V": [1.0], "dp_masks": segm,
    }
    dp = DensePoseDataRelative(ann)
    dp.apply_hflip(_toy_transform_data())
    assert dp.i[0] == POINT_LABEL_SYMMETRIES[3]
    np.testing.assert_allclose(dp.u[0], 1.0 - 0.25, atol=1e-2)
    np.testing.assert_allclose(dp.v[0], 1.0, atol=1e-6)  # part 3: identity V


def test_flip_iuv_raster_with_transform_data():
    td = _toy_transform_data()
    labels = np.array([[1, 0], [2, 1]], np.uint8)
    u = np.array([[0.2, 0.4], [0.6, 0.8]], np.float32)
    v = np.ones((2, 2), np.float32)
    lab2, u2, v2 = flip_iuv_raster(labels, u, v, td)
    # spatial mirror + label swap (1<->2)
    np.testing.assert_array_equal(lab2, [[0, 1], [1, 2]])
    # mirrored u values pushed through U' = 1 - u where fg
    np.testing.assert_allclose(u2[0], [0.4, 1.0 - 0.2], atol=1e-2)
    # part-1 pixels get V' = v/2, part-2 identity, bg untouched
    np.testing.assert_allclose(v2[1], [0.5, 1.0], atol=1e-2)
    np.testing.assert_allclose(v2[0, 0], 1.0)


def test_mapper_uses_transform_src_metadata(tmp_path):
    """With densepose_transform_src metadata present, mirrored samples keep
    UV supervision (gt_dp_uv_valid=1) with remapped values."""
    import tempfile

    from PIL import Image

    mat = str(tmp_path / "uv_sym.mat")
    _save_mat(mat)
    cfg = _cfg()
    cfg.INPUT.RANDOM_FLIP = "horizontal"
    cfg.DATASETS.TRAIN = ("_dp_td_mapper_ds",)
    train_name = cfg.DATASETS.TRAIN[0]
    MetadataCatalog.get(train_name).densepose_transform_src = mat
    if True:
        assert load_for_dataset(train_name) is not None
        mapper = DensePoseDatasetMapper(cfg, is_train=True)
        assert mapper.dp_transform_data is not None

        f = os.path.join(tempfile.mkdtemp(), "img.png")
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(f)
        d = {
            "file_name": f, "height": 64, "width": 64, "image_id": 0,
            "annotations": [{
                "bbox": [8, 8, 40, 40], "bbox_mode": 0, "category_id": 0,
                "iscrowd": 0,
                "dp_x": [64.0], "dp_y": [64.0], "dp_I": [3],
                "dp_U": [0.25], "dp_V": [1.0], "dp_masks": [],
            }],
        }
        mirrored = None
        for seed in range(40):
            out = mapper(dict(d), rng=np.random.RandomState(seed))
            if out["warp"][0, 0] < 0:
                mirrored = out
                break
        assert mirrored is not None, "flip never sampled"
        assert mirrored["gt_dp_uv_valid"][0, 0] == 1.0
        assert mirrored["gt_dp_I"][0, 0] == POINT_LABEL_SYMMETRIES[3]
        np.testing.assert_allclose(mirrored["gt_dp_U"][0, 0], 0.75, atol=1e-2)
        np.testing.assert_allclose(mirrored["gt_dp_V"][0, 0], 1.0, atol=1e-6)


def test_load_for_dataset_absent_is_none():
    meta = MetadataCatalog.get("_dp_td_absent_ds")
    assert load_for_dataset("_dp_td_absent_ds") is None
    meta.densepose_transform_src = "/nonexistent/uv.mat"
    assert load_for_dataset("_dp_td_absent_ds") is None
