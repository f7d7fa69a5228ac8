"""DensePose TTA (reference modeling/test_time_augmentation.py) and the
flip label-symmetry protocol (reference data/structures.py:13-16,180-230).
"""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose"))

from densepose_tpu import (  # noqa: E402
    DensePoseDatasetMapper,
    DensePoseTTAPredictor,
    POINT_LABEL_SYMMETRIES,
    add_densepose_config,
)
from densepose_tpu.tta import flip_iuv_raster  # noqa: E402
from detectron2_centernet_tpu.config import get_cfg  # noqa: E402
from detectron2_centernet_tpu.models import build_model  # noqa: E402

from .test_densepose import _cfg  # noqa: E402


def test_point_label_symmetries_involution():
    """The hardcoded table is a fixed-point-free-on-pairs involution over
    the 24 parts (reference structures.py:15)."""
    sym = np.asarray(POINT_LABEL_SYMMETRIES)
    assert sym.shape == (25,)
    assert sym[0] == 0
    np.testing.assert_array_equal(sym[sym], np.arange(25))


def test_flip_iuv_raster_roundtrip():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 25, (2, 8, 8)).astype(np.uint8)
    u, v = rng.rand(2, 8, 8), rng.rand(2, 8, 8)
    l2, u2, v2 = flip_iuv_raster(labels, u, v)
    # single application mirrors and swaps
    assert l2[0, 0, 0] == POINT_LABEL_SYMMETRIES[labels[0, 0, -1]]
    np.testing.assert_allclose(u2[:, :, 0], u[:, :, -1])
    # double application is the identity
    l3, u3, v3 = flip_iuv_raster(l2, u2, v2)
    np.testing.assert_array_equal(l3, labels)
    np.testing.assert_allclose(u3, u)
    np.testing.assert_allclose(v3, v)


def test_mapper_mirrored_sample_keeps_part_supervision():
    """A forced-mirror sample packs symmetric labels + mirrored x with
    gt_dp_uv_valid zeroed (reference flips via the label table; the UV
    chart lookup is external, so UV supervision is masked)."""
    cfg = _cfg()
    cfg.INPUT.RANDOM_FLIP = "horizontal"
    mapper = DensePoseDatasetMapper(cfg, is_train=True)

    import cv2  # noqa: F401  (mapper decodes through cv2/PIL)
    import tempfile

    from PIL import Image

    tmp = tempfile.mkdtemp()
    f = os.path.join(tmp, "img.png")
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(f)
    d = {
        "file_name": f, "height": 64, "width": 64, "image_id": 0,
        "annotations": [{
            "bbox": [8, 8, 40, 40], "bbox_mode": 0, "category_id": 0,
            "iscrowd": 0,
            "dp_x": [64.0, 128.0], "dp_y": [64.0, 128.0],
            "dp_I": [3, 10], "dp_U": [0.25, 0.5], "dp_V": [0.5, 0.75],
            "dp_masks": [],
        }],
    }
    # drive the mapper until both orientations are seen
    seen = {True: None, False: None}
    for seed in range(40):
        out = mapper(dict(d), rng=np.random.RandomState(seed))
        mirrored = out["warp"][0, 0] < 0
        if seen[bool(mirrored)] is None:
            seen[bool(mirrored)] = out
        if all(v is not None for v in seen.values()):
            break
    assert all(v is not None for v in seen.values()), "flip never sampled"

    straight, mirrored = seen[False], seen[True]
    np.testing.assert_allclose(straight["gt_dp_x"][0, :2], [64.0, 128.0])
    np.testing.assert_array_equal(straight["gt_dp_I"][0, :2], [3, 10])
    assert straight["gt_dp_uv_valid"][0, :2].all()

    np.testing.assert_allclose(mirrored["gt_dp_x"][0, :2], [192.0, 128.0])
    np.testing.assert_array_equal(
        mirrored["gt_dp_I"][0, :2],
        [POINT_LABEL_SYMMETRIES[3], POINT_LABEL_SYMMETRIES[10]],
    )
    assert mirrored["gt_dp_valid"][0, :2].all()
    assert not mirrored["gt_dp_uv_valid"][0, :2].any()


def test_densepose_tta_e2e():
    """Multi-scale + flip TTA on a tiny DensePose model: merged instances
    carry averaged box-frame IUV rasters of the right shapes."""
    cfg = _cfg()
    cfg.TEST.AUG.MIN_SIZES = (64, 96)
    cfg.TEST.AUG.FLIP = True
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    tta = DensePoseTTAPredictor(cfg, model, variables)
    image = (np.random.RandomState(0).rand(60, 70, 3) * 255).astype(np.float32)
    out = tta(image)["instances"]
    hs = cfg.MODEL.ROI_DENSEPOSE_HEAD.HEATMAP_SIZE
    n = len(out)
    assert out.dp_labels.shape == (n, hs, hs)
    assert out.dp_u.shape == (n, hs, hs)
    if n:
        assert out.dp_labels.max() <= 24
        assert 0.0 <= float(out.dp_u.min()) and float(out.dp_u.max()) <= 1.0
        # background texels carry zero UV
        bg = out.dp_labels == 0
        assert float(np.abs(out.dp_u[bg]).max(initial=0.0)) == 0.0


def test_densepose_tta_rejects_rotation():
    cfg = _cfg()
    cfg.TEST.AUG.ROTATION_ANGLES = (90,)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    with pytest.raises(NotImplementedError):
        DensePoseTTAPredictor(cfg, model, variables)
