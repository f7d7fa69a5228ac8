"""Pallas DCN sampling kernel vs numpy reference (TPU-only).

The kernel needs a real TPU (Mosaic); the CPU test platform skips it.
Run manually on hardware: JAX_PLATFORMS= pytest tests/ops/test_pallas_dcn.py
"""

import numpy as np
import pytest

import jax

if not any(d.platform == "tpu" for d in jax.devices()):
    pytest.skip("Pallas DCN kernel requires a TPU", allow_module_level=True)

import jax.numpy as jnp

from detectron2_centernet_tpu.ops.pallas_dcn import WINDOW, dcn_sample_pallas


def test_pallas_dcn_matches_reference():
    n, h, w, c = 1, 16, 128, 8
    rng = np.random.RandomState(0)
    x = rng.rand(n, h, w, c).astype(np.float32)
    off = ((rng.rand(n, h, w, 18) * 2 - 1) * 3).astype(np.float32)
    mask = rng.rand(n, h, w, 9).astype(np.float32)
    out = np.asarray(
        dcn_sample_pallas(jnp.asarray(x), jnp.asarray(off), jnp.asarray(mask))
    )

    offc = np.clip(off, -WINDOW, WINDOW)
    expected = np.zeros((n, h, w, 9 * c), np.float32)
    for r in range(h):
        for p in range(w):
            for k in range(9):
                ky, kx = k // 3 - 1, k % 3 - 1
                py = r + ky + offc[0, r, p, 2 * k]
                px = p + kx + offc[0, r, p, 2 * k + 1]
                y0, x0 = int(np.floor(py)), int(np.floor(px))
                v = np.zeros(c, np.float32)
                for a in (0, 1):
                    for b in (0, 1):
                        yy, xx = y0 + a, x0 + b
                        wgt = max(0.0, 1 - abs(py - yy)) * max(0.0, 1 - abs(px - xx))
                        if 0 <= yy < h and 0 <= xx < w and wgt > 0:
                            v += wgt * x[0, yy, xx]
                expected[0, r, p, k * c : (k + 1) * c] = v * mask[0, r, p, k]
    np.testing.assert_allclose(out, expected, atol=2e-5)
