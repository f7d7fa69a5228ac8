"""SwapAlign2Nat (TensorMask, arXiv:1903.12174) as dense MXU contractions.

Reference: ``/root/reference/projects/TensorMask/tensormask/layers/csrc/
SwapAlign2Nat/SwapAlign2Nat_cuda.cu:53-160,408-466`` — a CUDA kernel doing a
4-linear (quadri-linear) interpolation per output element that swaps the unit
lengths of the (V, U) mask axes and the (H, W) spatial axes, converting the
aligned mask representation to the natural one:

    X (N, V*U, H, W)  ->  Y (N, V'*U', H', W')
    V' = lambda * V,  U' = lambda * U,  H' = ceil(H / lambda),
    W' = ceil(W / lambda)

with sample positions (CUDA lines 82-104; all index arithmetic, **no
data-dependent offsets**):

    oy = y * lambda + v - V'/2 + 0.5       (depends on output v AND y)
    ox = x * lambda + u - U'/2 + 0.5
    ov = (v + 0.5) / lambda - 0.5          (depends on output v only)
    ou = (u + 0.5) / lambda - 0.5

Out-of-range samples contribute ``pad_val`` (not zero).

Because the interpolation weights are static and fully separable
(w = ty * tx * tv * tu), the whole op is one fixed linear map: we build four
1-D tent matrices at trace time (numpy) and apply them as einsums, which XLA
lowers to MXU-tiled batch matmuls.  The pad contribution is
``pad_val * (1 - M)`` where the in-bounds mass ``M`` is the same separable
product of per-axis masses — a trace-time constant.  Autodiff through the
einsums gives the exact transpose, replacing the reference's hand-written
backward kernel (CUDA lines 161-287).

This repo keeps NHWC layout: X is (N, H, W, V*U) and Y is (N, H', W', V'*U').
"""

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["swap_align2nat", "swap_align2nat_out_shape"]


def _axis_tents(pos: np.ndarray, size_in: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dense tent matrix T[k, i] for 2-point linear interpolation of positions
    ``pos`` (K,) into an axis of length ``size_in``; plus the in-bounds weight
    mass per position (K,)."""
    k = pos.shape[0]
    t = np.zeros((k, size_in), np.float32)
    mass = np.zeros((k,), np.float32)
    lo = np.floor(pos).astype(np.int64)
    hi = np.ceil(pos).astype(np.int64)
    w_hi = (pos - lo).astype(np.float32)
    w_lo = 1.0 - w_hi
    for row in range(k):
        for idx, w in ((lo[row], w_lo[row]), (hi[row], w_hi[row])):
            if 0 <= idx < size_in:
                t[row, idx] += w
                mass[row] += w
    return t, mass


def swap_align2nat_out_shape(
    shape: Tuple[int, ...], v: int, u: int, lambda_val: int
) -> Tuple[int, int, int, int]:
    n, h, w, _ = shape
    lam = lambda_val
    return (n, -(-h // lam), -(-w // lam), (v * lam) * (u * lam))


def swap_align2nat(
    x: jnp.ndarray,  # (N, H, W, V*U)
    v: int,
    u: int,
    lambda_val: int,
    pad_val: float = -6.0,
) -> jnp.ndarray:
    """Swap (V,U)<->(H,W) unit lengths, aligned -> natural representation."""
    n, hin, win, vu = x.shape
    assert vu == v * u, (vu, v, u)
    lam = int(lambda_val)
    assert lam >= 1
    vout, uout = v * lam, u * lam
    hout, wout = -(-hin // lam), -(-win // lam)

    yy = np.arange(hout, dtype=np.float32)
    xx = np.arange(wout, dtype=np.float32)
    vv = np.arange(vout, dtype=np.float32)
    uu = np.arange(uout, dtype=np.float32)

    # oy/ox depend on (v, y) / (u, x); ov/ou on v / u alone (CUDA :82-104)
    oy = yy[None, :] * lam + vv[:, None] - vout / 2.0 + 0.5  # (Vout, Hout)
    ox = xx[None, :] * lam + uu[:, None] - uout / 2.0 + 0.5  # (Uout, Wout)
    ov = (vv + 0.5) / lam - 0.5  # (Vout,)
    ou = (uu + 0.5) / lam - 0.5  # (Uout,)

    ty, my = _axis_tents(oy.reshape(-1), hin)  # (Vout*Hout, Hin)
    tx, mx = _axis_tents(ox.reshape(-1), win)
    tv, mv = _axis_tents(ov, v)  # (Vout, Vin)
    tu, mu = _axis_tents(ou, u)
    ty = ty.reshape(vout, hout, hin)
    tx = tx.reshape(uout, wout, win)
    my = my.reshape(vout, hout)
    mx = mx.reshape(uout, wout)

    # in-bounds mass (trace-time constant): M[y, x, v, u] =
    # my[v, y] * mx[u, x] * mv[v] * mu[u]
    mass = (
        my.T[:, None, :, None]  # (Hout, 1, Vout, 1)
        * mx.T[None, :, None, :]  # (1, Wout, 1, Uout)
        * mv[None, None, :, None]
        * mu[None, None, None, :]
    )  # (Hout, Wout, Vout, Uout)

    cdt = x.dtype
    xr = x.reshape(n, hin, win, v, u)
    # contract mask axes first (small), then the v/u-batched spatial axes
    z = jnp.einsum("VY,nhwYu->nhwVu", jnp.asarray(tv, cdt), xr)
    z = jnp.einsum("UX,nhwVX->nhwVU", jnp.asarray(tu, cdt), z)
    z = jnp.einsum("Vyh,nhwVU->nywVU", jnp.asarray(ty, cdt), z)
    z = jnp.einsum("Uxw,nywVU->nyxVU", jnp.asarray(tx, cdt), z)
    z = z + jnp.asarray((1.0 - mass) * pad_val, cdt)
    return z.reshape(n, hout, wout, vout * uout)
