"""Blocked-window deform conv == exact path when offsets fit the window."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_centernet_tpu.ops.deform_conv import modulated_deform_conv


def _inputs(seed=0, n=2, h=16, w=16, cin=8, cout=4, off_scale=1.5):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(n, h, w, cin), jnp.float32)
    offset = jnp.asarray((rng.rand(n, h, w, 18) * 2 - 1) * off_scale, jnp.float32)
    mask = jnp.asarray(rng.rand(n, h, w, 9), jnp.float32)
    weight = jnp.asarray(rng.rand(3, 3, cin, cout) - 0.5, jnp.float32)
    bias = jnp.asarray(rng.rand(cout), jnp.float32)
    return x, offset, mask, weight, bias


@pytest.mark.parametrize("window", [2, 3])
def test_window_matches_exact_when_offsets_small(window):
    x, offset, mask, weight, bias = _inputs(off_scale=window - 0.25)
    exact = modulated_deform_conv(x, offset, mask, weight, bias)
    fast = modulated_deform_conv(x, offset, mask, weight, bias, window=window)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=2e-4, rtol=1e-3)


def test_window_clamps_large_offsets():
    # offsets beyond the window are clamped: result differs from exact but
    # equals the exact result computed with pre-clamped offsets
    x, offset, mask, weight, bias = _inputs(off_scale=6.0)
    win = 2
    fast = modulated_deform_conv(x, offset, mask, weight, bias, window=win)
    clamped = jnp.clip(offset, -win, win)
    exact_clamped = modulated_deform_conv(x, clamped, mask, weight, bias)
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact_clamped), atol=2e-4, rtol=1e-3
    )


def test_window_gradients_flow():
    x, offset, mask, weight, bias = _inputs()

    def loss(weight, offset):
        out = modulated_deform_conv(x, offset, mask, weight, bias, window=3)
        return (out ** 2).sum()

    gw, go = jax.grad(loss, argnums=(0, 1))(weight, offset)
    assert np.isfinite(np.asarray(gw)).all() and np.abs(np.asarray(gw)).sum() > 0
    assert np.isfinite(np.asarray(go)).all() and np.abs(np.asarray(go)).sum() > 0


def test_window_falls_back_on_odd_shapes():
    # 15x15 not divisible by 4 -> exact path, still correct
    x, offset, mask, weight, bias = _inputs(h=15, w=15)
    out = modulated_deform_conv(x, offset, mask, weight, bias, window=3)
    ref = modulated_deform_conv(x, offset, mask, weight, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
