"""DensePose result packing + visualizers (reference structures.py:536-640,
vis/densepose.py, vis/base.py, apply_net.py)."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "..", "projects", "DensePose")
)

from densepose_tpu.structures import (  # noqa: E402
    DensePoseResult,
    resample_iuv_to_bbox,
)
from densepose_tpu.vis import (  # noqa: E402
    BoundingBoxVisualizer,
    CompoundVisualizer,
    DensePoseResultsContourVisualizer,
    DensePoseResultsFineSegmentationVisualizer,
    DensePoseResultsUVisualizer,
    DensePoseResultsVVisualizer,
    ScoredBoundingBoxVisualizer,
    create_extractor,
)


def test_png_codec_roundtrip_exact():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(3, 17, 23), dtype=np.uint8)
    s = DensePoseResult.encode_png_data(arr)
    back = DensePoseResult.decode_png_data(arr.shape, s)
    np.testing.assert_array_equal(arr, back)


def test_resample_iuv_semantics():
    """Part ids resize nearest (stay integral), U/V bilinear, background
    zeroed in the U/V channels."""
    s = 8
    labels = np.zeros((s, s), np.uint8)
    labels[:, s // 2 :] = 7  # right half is part 7
    u = np.linspace(0, 1, s * s, dtype=np.float32).reshape(s, s)
    v = np.ones((s, s), np.float32) * 0.5
    iuv = resample_iuv_to_bbox(labels, u, v, (0, 0, 16, 12))
    assert iuv.shape == (3, 12, 16)
    assert set(np.unique(iuv[0])) == {0, 7}
    assert (iuv[1][iuv[0] == 0] == 0).all()  # bg zeroed
    assert (iuv[2][iuv[0] == 7] == 127).all()  # 0.5 * 255 -> 127
    # degenerate box clamps to 1x1
    tiny = resample_iuv_to_bbox(labels, u, v, (3, 3, 0.4, 0.2))
    assert tiny.shape == (3, 1, 1)


def _fake_result():
    s = 8
    labels = np.zeros((s, s), np.uint8)
    labels[2:6, 2:6] = 3
    u = np.full((s, s), 0.25, np.float32)
    v = np.full((s, s), 0.75, np.float32)
    boxes = np.array([[4.0, 5.0, 10.0, 8.0]])  # xywh
    return DensePoseResult(boxes, [labels], [u], [v])


def test_densepose_result_protocol():
    dp = _fake_result()
    assert len(dp) == 1
    (shape, data), box = dp[0]
    assert shape == (3, 8, 10)
    assert box == [4.0, 5.0, 10.0, 8.0]
    iuv = DensePoseResult.decode_png_data(shape, data)
    assert (iuv[0] <= 24).all()
    assert "N=1" in str(dp)


@pytest.mark.parametrize(
    "vis_cls",
    [
        DensePoseResultsFineSegmentationVisualizer,
        DensePoseResultsUVisualizer,
        DensePoseResultsVVisualizer,
        DensePoseResultsContourVisualizer,
    ],
)
def test_visualizers_touch_only_the_box(vis_cls):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    dp = _fake_result()
    img = np.full((32, 32, 3), 128, np.uint8)
    out = vis_cls(inplace=False).visualize(img.copy(), dp)
    assert out.shape == img.shape and out.dtype == np.uint8
    # nothing outside the (4,5)+(10,8) box may change
    mask = np.zeros((32, 32), bool)
    mask[5 : 5 + 8, 4 : 4 + 10] = True
    assert (out[~mask] == 128).all()
    # segm/U/V visualizers must change at least one fg pixel
    if vis_cls is not DensePoseResultsContourVisualizer:
        assert (out[mask] != 128).any()


def test_box_visualizers_and_compound():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    img = np.zeros((20, 20, 3), np.uint8)
    boxes = np.array([[2.0, 3.0, 8.0, 6.0]])
    out = BoundingBoxVisualizer().visualize(img.copy(), boxes)
    assert (out != 0).any()
    out2 = ScoredBoundingBoxVisualizer().visualize(
        np.zeros((20, 20, 3), np.uint8), (boxes, np.array([0.9]))
    )
    assert (out2 != 0).any()
    comp = CompoundVisualizer([BoundingBoxVisualizer()])
    out3 = comp.visualize(np.zeros((20, 20, 3), np.uint8), [boxes])
    assert (out3 != 0).any()
    assert "BoundingBoxVisualizer" in str(comp)


def test_create_extractor_on_instances():
    from detectron2_centernet_tpu.structures import Boxes, Instances

    inst = Instances((32, 32))
    inst.pred_boxes = Boxes(np.array([[4.0, 5.0, 14.0, 13.0]], np.float32))
    inst.scores = np.array([0.9], np.float32)
    s = 8
    inst.dp_labels = np.full((1, s, s), 2, np.uint8)
    inst.dp_u = np.full((1, s, s), 0.5, np.float32)
    inst.dp_v = np.full((1, s, s), 0.5, np.float32)

    vis = CompoundVisualizer(
        [DensePoseResultsFineSegmentationVisualizer(), ScoredBoundingBoxVisualizer()]
    )
    extractor = create_extractor(vis)
    data = extractor(inst)
    assert len(data) == 2
    assert isinstance(data[0], DensePoseResult)
    boxes, scores = data[1]
    np.testing.assert_allclose(boxes, [[4.0, 5.0, 10.0, 8.0]])
    np.testing.assert_allclose(scores, [0.9])


def test_apply_net_cli_help():
    """The CLI parses both actions (smoke; a full run needs weights)."""
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    script = os.path.join(root, "projects", "DensePose", "apply_net.py")
    for action in ("dump", "show"):
        r = subprocess.run(
            [sys.executable, script, action, "--help"],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        assert action in r.stdout
