import numpy as np

from detectron2_centernet_tpu.ops import gaussian_radius, gen_centernet_targets, gen_centernet_targets_batch

from .naive_ref import naive_centernet_targets, ref_gaussian_radius


def test_gaussian_radius_matches_reference_formula():
    sizes = [(1, 1), (3, 7), (10, 10), (25, 60), (100, 40), (128, 128)]
    hs = np.array([s[0] for s in sizes], np.float32)
    ws = np.array([s[1] for s in sizes], np.float32)
    got = np.asarray(gaussian_radius(hs, ws))
    want = np.array([ref_gaussian_radius(s) for s in sizes], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _random_objects(rng, n_obj, out_h, out_w, num_classes, max_objs, down_ratio=4):
    in_h, in_w = out_h * down_ratio, out_w * down_ratio
    x1 = rng.uniform(0, in_w - 8, n_obj)
    y1 = rng.uniform(0, in_h - 8, n_obj)
    bw = rng.uniform(4, in_w / 2, n_obj)
    bh = rng.uniform(4, in_h / 2, n_obj)
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, in_w - 1), np.minimum(y1 + bh, in_h - 1)], 1)
    classes = rng.integers(0, num_classes, n_obj)
    padded_boxes = np.zeros((max_objs, 4), np.float32)
    padded_boxes[:n_obj] = boxes
    padded_cls = np.zeros(max_objs, np.int32)
    padded_cls[:n_obj] = classes
    valid = np.zeros(max_objs, bool)
    valid[:n_obj] = True
    return boxes, classes, padded_boxes, padded_cls, valid


def test_targets_match_naive_loop():
    rng = np.random.default_rng(0)
    out_h, out_w, num_classes, max_objs = 32, 40, 5, 16
    boxes, classes, pb, pc, valid = _random_objects(rng, 9, out_h, out_w, num_classes, max_objs)
    got = gen_centernet_targets(pb, pc, valid, num_classes, out_h, out_w, 4)
    want = naive_centernet_targets(boxes, classes, num_classes, out_h, out_w, max_objs)
    np.testing.assert_allclose(np.asarray(got["hm"]), want["hm"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["wh"]), want["wh"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["reg"]), want["reg"], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["ind"]), want["ind"])
    np.testing.assert_array_equal(np.asarray(got["reg_mask"]), want["reg_mask"])


def test_degenerate_and_empty():
    out_h = out_w = 16
    pb = np.zeros((8, 4), np.float32)
    pb[0] = [4, 4, 4, 20]  # zero width -> skipped like the reference h>0,w>0 check
    pc = np.zeros(8, np.int32)
    valid = np.zeros(8, bool)
    valid[0] = True
    got = gen_centernet_targets(pb, pc, valid, 3, out_h, out_w, 4)
    assert np.asarray(got["hm"]).max() == 0.0
    assert np.asarray(got["reg_mask"]).sum() == 0.0

    # fully empty image
    got = gen_centernet_targets(pb, pc, np.zeros(8, bool), 3, out_h, out_w, 4)
    assert np.asarray(got["hm"]).max() == 0.0


def test_center_is_one():
    """A clean box center gets heatmap value exactly 1."""
    pb = np.zeros((4, 4), np.float32)
    pb[0] = [8, 8, 40, 40]
    pc = np.array([2, 0, 0, 0], np.int32)
    valid = np.array([True, False, False, False])
    got = gen_centernet_targets(pb, pc, valid, 3, 16, 16, 4)
    hm = np.asarray(got["hm"])
    assert hm[6, 6, 2] == 1.0  # center (24, 24)/4 = (6, 6)
    assert hm[:, :, 0].max() == 0.0  # other classes untouched


def test_batched():
    rng = np.random.default_rng(1)
    out_h = out_w = 24
    _, _, pb1, pc1, v1 = _random_objects(rng, 5, out_h, out_w, 4, 8)
    _, _, pb2, pc2, v2 = _random_objects(rng, 3, out_h, out_w, 4, 8)
    got = gen_centernet_targets_batch(
        np.stack([pb1, pb2]), np.stack([pc1, pc2]), np.stack([v1, v2]), 4, out_h, out_w, 4
    )
    single = gen_centernet_targets(pb2, pc2, v2, 4, out_h, out_w, 4)
    np.testing.assert_allclose(np.asarray(got["hm"][1]), np.asarray(single["hm"]), rtol=1e-6)
    assert got["hm"].shape == (2, out_h, out_w, 4)
