"""SwapAlign2Nat vs a literal numpy oracle of the reference CUDA kernel
(``SwapAlign2Nat_cuda.cu:53-160``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.ops.swap_align2nat import (
    swap_align2nat,
    swap_align2nat_out_shape,
)


def _oracle(x_nchw, v_in, u_in, lam, pad_val):
    """Literal transcription of the CUDA forward (per-element loop)."""
    n, vu, hin, win = x_nchw.shape
    x5 = x_nchw.reshape(n, v_in, u_in, hin, win)
    vout, uout = v_in * lam, u_in * lam
    hout, wout = -(-hin // lam), -(-win // lam)
    hv, hu = vout / 2.0, uout / 2.0
    out = np.zeros((n, vout, uout, hout, wout), np.float32)

    def px(idx, y, x, vv, uu):
        if (y < 0 or y >= hin or x < 0 or x >= win or vv < 0 or vv >= v_in
                or uu < 0 or uu >= u_in):
            return pad_val
        return x5[idx, vv, uu, y, x]

    for idx in range(n):
        for v in range(vout):
            for u in range(uout):
                for y in range(hout):
                    for x in range(wout):
                        ox = x * lam + u - hu + 0.5
                        xf, xc = int(np.floor(ox)), int(np.ceil(ox))
                        xwc = ox - xf
                        xwf = 1.0 - xwc
                        oy = y * lam + v - hv + 0.5
                        yf, yc = int(np.floor(oy)), int(np.ceil(oy))
                        ywc = oy - yf
                        ywf = 1.0 - ywc
                        ou = (u + 0.5) / lam - 0.5
                        uf, uc = int(np.floor(ou)), int(np.ceil(ou))
                        uwc = ou - uf
                        uwf = 1.0 - uwc
                        ov = (v + 0.5) / lam - 0.5
                        vf, vc = int(np.floor(ov)), int(np.ceil(ov))
                        vwc = ov - vf
                        vwf = 1.0 - vwc
                        val = 0.0
                        for yy, wy in ((yf, ywf), (yc, ywc)):
                            for xx, wx in ((xf, xwf), (xc, xwc)):
                                for vv, wv in ((vf, vwf), (vc, vwc)):
                                    for uu, wu in ((uf, uwf), (uc, uwc)):
                                        val += wy * wx * wv * wu * px(
                                            idx, yy, xx, vv, uu
                                        )
                        out[idx, v, u, y, x] = val
    return out.reshape(n, vout * uout, hout, wout)


@pytest.mark.parametrize("lam,v,u,h,w", [(1, 3, 3, 6, 8), (2, 2, 2, 10, 10),
                                         (2, 3, 2, 7, 9)])
def test_matches_cuda_oracle(lam, v, u, h, w):
    rng = np.random.RandomState(0)
    x_nchw = rng.randn(2, v * u, h, w).astype(np.float32)
    ref = _oracle(x_nchw, v, u, lam, pad_val=-6.0)

    # our op is NHWC with (V*U) channels
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = swap_align2nat(x_nhwc, v, u, lam, pad_val=-6.0)
    n, ho, wo, c = swap_align2nat_out_shape(x_nhwc.shape, v, u, lam)
    assert got.shape == (n, ho, wo, c)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, ref, atol=1e-4, rtol=1e-4)


def test_gradients_flow():
    """Autodiff through the einsums is the exact linear-map transpose."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 6, 6, 4), jnp.float32)

    def f(x):
        return jnp.sum(jnp.sin(swap_align2nat(x, 2, 2, 2)))

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    # finite-difference spot check
    eps = 1e-3
    d = np.zeros_like(np.asarray(x))
    d[0, 2, 3, 1] = eps
    num = (f(x + d) - f(x - d)) / (2 * eps)
    np.testing.assert_allclose(float(num), float(g[0, 2, 3, 1]), atol=1e-2)
