import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from detectron2_centernet_tpu.ops import modulated_deform_conv  # noqa: E402

from .naive_ref import naive_modulated_deform_conv  # noqa: E402


def _random_case(rng, n=2, h=6, w=5, ci=3, co=4, kh=3, kw=3, off_scale=2.0):
    k = kh * kw
    x = rng.standard_normal((n, h, w, ci)).astype(np.float32)
    offset = (rng.standard_normal((n, h, w, 2 * k)) * off_scale).astype(np.float32)
    mask = rng.uniform(0, 1, (n, h, w, k)).astype(np.float32)
    weight = rng.standard_normal((kh, kw, ci, co)).astype(np.float32) * 0.2
    bias = rng.standard_normal(co).astype(np.float32)
    return x, offset, mask, weight, bias


def test_matches_naive_reference():
    rng = np.random.default_rng(0)
    x, offset, mask, weight, bias = _random_case(rng)
    got = modulated_deform_conv(x, offset, mask, weight, bias)
    want = naive_modulated_deform_conv(x, offset, mask, weight, bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_zero_offset_ones_mask_is_plain_conv():
    """With zero offsets and unit masks, DCN must equal a SAME conv."""
    rng = np.random.default_rng(1)
    n, h, w, ci, co = 2, 8, 8, 4, 6
    x = rng.standard_normal((n, h, w, ci)).astype(np.float32)
    weight = rng.standard_normal((3, 3, ci, co)).astype(np.float32) * 0.1
    offset = np.zeros((n, h, w, 18), np.float32)
    mask = np.ones((n, h, w, 9), np.float32)
    got = modulated_deform_conv(x, offset, mask, weight)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x),
        jnp.asarray(weight),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_is_shift():
    """An integer offset samples exactly the shifted pixel (no interpolation)."""
    rng = np.random.default_rng(2)
    h = w = 6
    x = rng.standard_normal((1, h, w, 1)).astype(np.float32)
    # 1x1 kernel, weight 1: output = sampled input
    weight = np.ones((1, 1, 1, 1), np.float32)
    offset = np.zeros((1, h, w, 2), np.float32)
    offset[..., 0] = 1.0  # dy = +1
    mask = np.ones((1, h, w, 1), np.float32)
    got = np.asarray(
        modulated_deform_conv(x, offset, mask, weight, kernel_size=(1, 1))
    )
    np.testing.assert_allclose(got[0, :-1, :, 0], x[0, 1:, :, 0], rtol=1e-5)
    np.testing.assert_allclose(got[0, -1, :, 0], 0.0)  # sampled out of bounds


def test_stride_two():
    rng = np.random.default_rng(3)
    x, offset, mask, weight, bias = _random_case(rng, h=7, w=6)
    offset = offset[:, ::2, ::2]
    mask = mask[:, ::2, ::2]
    got = modulated_deform_conv(x, offset, mask, weight, bias, stride=2)
    want = naive_modulated_deform_conv(x, offset, mask, weight, bias, stride=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_gradients_flow_and_are_finite():
    rng = np.random.default_rng(4)
    x, offset, mask, weight, bias = _random_case(rng, n=1, h=5, w=5)

    def loss(x, offset, mask, weight, bias):
        return jnp.sum(modulated_deform_conv(x, offset, mask, weight, bias) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight), jnp.asarray(bias)
    )
    for g, ref in zip(grads, (x, offset, mask, weight, bias)):
        assert g.shape == ref.shape
        assert np.isfinite(np.asarray(g)).all()
    # offset gradient must be nonzero: sampling is differentiable in position
    assert np.abs(np.asarray(grads[1])).max() > 0


def test_offset_gradient_numerically():
    """Finite-difference check of d(output)/d(offset) at one coordinate."""
    rng = np.random.default_rng(5)
    x, offset, mask, weight, _ = _random_case(rng, n=1, h=5, w=5, off_scale=0.3)

    def f(off_scalar):
        off = offset.copy()
        off[0, 2, 2, 4] += off_scalar
        return float(
            jnp.sum(modulated_deform_conv(x, off, mask, weight))
        )

    eps = 1e-3
    fd = (f(eps) - f(-eps)) / (2 * eps)

    def loss(off):
        return jnp.sum(modulated_deform_conv(x, off, mask, weight))

    g = np.asarray(jax.grad(loss)(jnp.asarray(offset)))[0, 2, 2, 4]
    np.testing.assert_allclose(g, fd, rtol=2e-2, atol=2e-3)
