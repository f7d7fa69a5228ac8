import numpy as np

from detectron2_centernet_tpu.ops import ctdet_decode, heat_nms

from .naive_ref import naive_ctdet_decode


def _random_heatmap(rng, n=2, h=16, w=20, c=4):
    hm = rng.uniform(1e-4, 1 - 1e-4, (n, h, w, c)).astype(np.float32)
    wh = rng.uniform(0.5, 8, (n, h, w, 2)).astype(np.float32)
    reg = rng.uniform(0, 1, (n, h, w, 2)).astype(np.float32)
    return hm, wh, reg


def test_heat_nms_keeps_only_local_maxima():
    hm = np.zeros((1, 5, 5, 1), np.float32)
    hm[0, 2, 2, 0] = 0.9
    hm[0, 2, 3, 0] = 0.5  # adjacent, suppressed
    hm[0, 0, 0, 0] = 0.3  # its own corner peak
    out = np.asarray(heat_nms(hm))
    assert out[0, 2, 2, 0] == 0.9
    assert out[0, 2, 3, 0] == 0.0
    assert out[0, 0, 0, 0] == 0.3


def test_decode_matches_naive():
    rng = np.random.default_rng(0)
    hm, wh, reg = _random_heatmap(rng)
    k = 20
    boxes, scores, classes = (np.asarray(v) for v in ctdet_decode(hm, wh, reg, k=k))
    for b in range(hm.shape[0]):
        wb, ws, wc = naive_ctdet_decode(hm[b], wh[b], reg[b], k=k)
        np.testing.assert_allclose(scores[b], ws, rtol=1e-6)
        # ties could permute equal-score rows; scores here are continuous so
        # ordering is unique with probability 1
        np.testing.assert_array_equal(classes[b], wc)
        np.testing.assert_allclose(boxes[b], wb, rtol=1e-5, atol=1e-5)


def test_decode_known_peak():
    h = w = 8
    hm = np.full((1, h, w, 2), 1e-4, np.float32)
    hm[0, 3, 5, 1] = 0.8
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 3, 5] = [4.0, 2.0]
    reg = np.zeros((1, h, w, 2), np.float32)
    reg[0, 3, 5] = [0.25, 0.5]
    boxes, scores, classes = ctdet_decode(hm, wh, reg, k=1, down_ratio=4)
    assert float(scores[0, 0]) == np.float32(0.8)
    assert int(classes[0, 0]) == 1
    # center (5.25, 3.5), wh (4, 2) -> box (3.25, 2.5, 7.25, 4.5) * 4
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), [13.0, 10.0, 29.0, 18.0], rtol=1e-5)


def test_decode_shapes_static():
    rng = np.random.default_rng(1)
    hm, wh, reg = _random_heatmap(rng, n=3)
    boxes, scores, classes = ctdet_decode(hm, wh, reg, k=100)
    assert boxes.shape == (3, 100, 4)
    assert scores.shape == (3, 100)
    assert classes.shape == (3, 100)


def test_approx_topk_recovers_distinct_peaks():
    """approx_max_k candidate selection must find well-separated peaks
    (the TPU PartialReduce path used when TPU.APPROX_TOPK is on)."""
    import numpy as np
    import jax.numpy as jnp

    from detectron2_centernet_tpu.ops.decode import ctdet_decode

    rng = np.random.RandomState(0)
    hm = rng.rand(2, 32, 32, 5).astype(np.float32) * 0.05
    peaks = [(4, 7, 1), (20, 25, 3), (9, 28, 0)]
    for y, x, c in peaks:
        hm[:, y, x, c] = 0.9
    wh = np.full((2, 32, 32, 2), 4.0, np.float32)
    reg = np.zeros((2, 32, 32, 2), np.float32)
    boxes, scores, classes = ctdet_decode(
        jnp.asarray(hm), jnp.asarray(wh), jnp.asarray(reg), k=10, approx=True
    )
    top = set()
    for i in range(3):
        cx = (boxes[0, i, 0] + boxes[0, i, 2]) / 2 / 4
        cy = (boxes[0, i, 1] + boxes[0, i, 3]) / 2 / 4
        top.add((int(round(float(cy))), int(round(float(cx))), int(classes[0, i])))
    assert top == set(peaks), top


def test_device_color_aug_ssd():
    """SSD photometric distortion (reference PointRend color_augmentation):
    output in [0,255], deterministic per key, identity when all gates
    lose (checked by zero-width draw ranges)."""
    import jax
    import jax.numpy as jnp

    from detectron2_centernet_tpu.ops.photometric import device_color_aug_ssd

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(3, 16, 16, 3) * 255, jnp.float32)
    y = device_color_aug_ssd(x, jax.random.PRNGKey(1))
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 255.0
    y2 = device_color_aug_ssd(x, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # zero-magnitude distortions = identity regardless of the gates
    yid = device_color_aug_ssd(
        x, jax.random.PRNGKey(2), brightness_delta=0.0,
        contrast=(1.0, 1.0), saturation=(1.0, 1.0), hue_delta_deg=0.0,
    )
    np.testing.assert_allclose(np.asarray(yid), np.asarray(x), atol=1e-3)
    # hue rotation preserves luma (YIQ Y channel) when only hue is active
    # hue rotation preserves luma (YIQ Y) while no channel clips
    xm = x * 0.4 + 80.0  # mid-range: rotation stays inside [0, 255]
    yh = device_color_aug_ssd(
        xm, jax.random.PRNGKey(3), brightness_delta=0.0,
        contrast=(1.0, 1.0), saturation=(1.0, 1.0), hue_delta_deg=18.0,
    )
    luma = lambda a: np.asarray(a)[..., ::-1] @ np.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(luma(yh), luma(xm), atol=0.1)
