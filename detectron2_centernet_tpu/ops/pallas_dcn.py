"""Pallas TPU kernel for modulated-deformable-conv sampling.

The XLA paths in ``deform_conv.py`` bottleneck on gather bandwidth (~35-55
GB/s effective).  This kernel fuses the whole bilinear sampling stage in
VMEM: each grid step owns one (batch, output-row) pair, DMAs the 8-row input
band it needs (window ±2 around the 3x3 kernel), and samples all 9 taps with
in-register lane gathers (`tpu.dynamic_gather` via ``take_along_axis`` along
the 128-lane axis) — one pass over HBM instead of descriptor-driven gathers.
Tap and band-row loops are ``fori_loop``s (traced ref indices) to keep the
Mosaic program small.

Scope/constraints (checked by the wrapper):
  * 3x3 kernel, stride 1, dilation 1 (the DLA-up configuration)
  * offsets clamped to ±2 (the kernel's window)
  * W (image width) a multiple of 128 lanes; C a multiple of 8 sublanes.
Forward-only: when enabled, training still differentiates through the XLA
windowed path (paired in ``deform_conv.py``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dcn_sample_pallas", "WINDOW"]

WINDOW = 2  # offset clamp; band height = 2*WINDOW + 4 = 8 rows
_BAND = 2 * WINDOW + 4


def _kernel(off_ref, mask_ref, x_hbm, o_ref, band, sem, *, h: int, w: int, c: int):
    i = pl.program_id(0)
    r = pl.program_id(1)
    band0 = jnp.clip(r - 1 - WINDOW, 0, h - _BAND)

    copy = pltpu.make_async_copy(x_hbm.at[i, pl.ds(band0, _BAND)], band, sem)
    copy.start()

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)[0].astype(jnp.float32)
    rf = r.astype(jnp.float32)
    b0f = band0.astype(jnp.float32)

    copy.wait()

    def tap_body(k, _):
        ky = (k // 3 - 1).astype(jnp.float32)
        kx = (k % 3 - 1).astype(jnp.float32)
        dy = jnp.clip(off_ref[0, 0, k, 0], -1.0 * WINDOW, 1.0 * WINDOW)  # (W,)
        dx = jnp.clip(off_ref[0, 0, k, 1], -1.0 * WINDOW, 1.0 * WINDOW)
        py = rf + ky + dy - b0f
        px = lanes + kx + dx
        mk = mask_ref[0, 0, k]  # (W,)

        x0 = jnp.clip(jnp.floor(px), 0.0, w - 2.0)
        wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(px - x0))
        wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(px - (x0 + 1.0)))
        xi0 = jnp.broadcast_to(x0.astype(jnp.int32)[None, :], (c, w))
        xi1 = jnp.minimum(xi0 + 1, w - 1)

        def row_body(j, acc):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(py - j.astype(jnp.float32)))
            row = band[j].astype(jnp.float32)  # (C, W)
            g0 = jnp.take_along_axis(row, xi0, axis=1)
            g1 = jnp.take_along_axis(row, xi1, axis=1)
            return acc + (wy * wx0)[None, :] * g0 + (wy * wx1)[None, :] * g1

        acc = jax.lax.fori_loop(0, _BAND, row_body, jnp.zeros((c, w), jnp.float32))
        o_ref[0, 0, k] = (acc * mk[None, :]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, 9, tap_body, 0)


def dcn_sample_pallas(
    x: jnp.ndarray,  # (N, H, W, C)
    offset: jnp.ndarray,  # (N, H, W, 18) f32
    mask: jnp.ndarray,  # (N, H, W, 9) f32 (sigmoided)
) -> jnp.ndarray:
    """(N, H, W, 9*C) modulated bilinear samples, offsets clamped to ±WINDOW."""
    n, h, w, c = x.shape
    assert w % 128 == 0 and c % 8 == 0 and h >= _BAND, (h, w, c)
    xt = jnp.swapaxes(x, 2, 3)  # (N, H, C, W): W on lanes inside the band
    # tap-major layouts so the kernel can index taps with a traced loop var
    off_t = offset.reshape(n, h, w, 9, 2).transpose(0, 1, 3, 4, 2)  # (N,H,9,2,W)
    mask_t = jnp.swapaxes(mask, 2, 3)  # (N, H, 9, W)

    kernel = functools.partial(_kernel, h=h, w=w, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec((1, 1, 9, 2, w), lambda i, r: (i, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, w), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; DMA'd
        ],
        out_specs=pl.BlockSpec((1, 1, 9, c, w), lambda i, r: (i, r, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, 9, c, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((_BAND, c, w), xt.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(off_t, mask_t, xt)
    # (N, H, 9, C, W) -> (N, H, W, 9*C)
    return out.transpose(0, 1, 4, 2, 3).reshape(n, h, w, 9 * c)
