"""BilinearUpsample (DLA IDAUp deconv) vs a float64 transposed-conv oracle.

The module picks between two formulations per shape (phase-decomposed
FMAs at small extents, one input-dilated XLA conv elsewhere); both must
equal the reference's grouped ``ConvTranspose2d(o, o, 2f, stride=f,
padding=f//2, groups=o)`` semantics (reference dla.py:162-165) up to the
kernel-flip convention handled at import (torch_import.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from detectron2_centernet_tpu.models.layers import BilinearUpsample


def _oracle(x, k, f):
    """float64 correlation over the f-dilated, pad=(2f-1-f//2) input."""
    n, h, w, c = x.shape
    size = 2 * f
    pad = 2 * f - 1 - f // 2
    dh, dw = (h - 1) * f + 1, (w - 1) * f + 1
    dil = np.zeros((n, dh + 2 * pad, dw + 2 * pad, c), np.float64)
    dil[:, pad : pad + dh : f, pad : pad + dw : f, :] = x
    out = np.zeros((n, h * f, w * f, c), np.float64)
    for y in range(h * f):
        for z in range(w * f):
            patch = dil[:, y : y + size, z : z + size, :]
            out[:, y, z, :] = (patch * k[:, :, 0, :]).sum(axis=(1, 2))
    return out


@pytest.mark.parametrize(
    "f,h,w,c",
    [
        (2, 4, 4, 8),    # phase-decomposed branch (f=2, small extent)
        (2, 7, 9, 16),   # phase branch, odd extents (border taps)
        (2, 33, 33, 8),  # dilated-conv branch (h*w > 32*32)
        (4, 4, 4, 8),    # dilated branch (f > 2)
        (8, 4, 6, 8),
    ],
)
def test_matches_transposed_conv_oracle(f, h, w, c):
    rng = np.random.RandomState(f * 100 + h)
    x = rng.randn(2, h, w, c).astype(np.float32)
    k = rng.randn(2 * f, 2 * f, 1, c).astype(np.float32)
    m = BilinearUpsample(factor=f)
    out = m.apply({"params": {"kernel": jnp.asarray(k)}}, jnp.asarray(x))
    ref = _oracle(x, k, f)
    assert out.shape == (2, f * h, f * w, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_bilinear_init_interpolates_constant():
    """With the default bilinear kernel a constant field stays constant in
    the interior (partition of unity away from borders)."""
    f, h, w, c = 2, 6, 6, 4
    m = BilinearUpsample(factor=f)
    x = jnp.ones((1, h, w, c), jnp.float32) * 3.25
    import jax

    variables = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(variables, x))
    interior = out[:, f : -f, f : -f, :]
    np.testing.assert_allclose(interior, 3.25, rtol=1e-6)
