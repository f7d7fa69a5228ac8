"""Pallas TPU kernel: modulated deformable 3x3 conv (DCNv2) forward.

Replaces the reference's ``modulated_deformable_im2col`` CUDA kernels
(``/root/reference/detectron2/layers/csrc/deformable/deform_conv_cuda_kernel.cu:786-952``)
with an MXU-native formulation.  Per-pixel 2D deformable sampling is NOT
separable (the vertical sample position varies with the output column), so
instead of gather ops the kernel expresses bilinear interpolation as two
matrix contractions per (output row, tap):

  1. **Horizontal tent matmul** — ``G = Hk @ band^T`` where
     ``Hk[x', x] = max(0, 1 - |x - Qx_k(r, x')|)`` is the bilinear "tent"
     over the *full* row (horizontal offsets are EXACT/unbounded) and
     ``band`` is a vertical slab of ``BAND = 2*v_window + 4`` input rows
     held as ``[(row, cin), x]`` in VMEM.  One 128-deep MXU contraction
     replaces all horizontal gathers.
  2. **Vertical tent + conv fold** — the vertical tent (× modulation mask)
     is applied per lane-group on the VPU, then a second MXU dot with the
     tap's conv weight *broadcast over band rows* (``EW_k[(row, cin), cout]
     = W_k[cin, cout]``) simultaneously contracts band rows, input channels
     and accumulates the 3x3-conv output — no 9*Cin patch tensor ever
     touches HBM.

Semantics vs the exact op (``deform_conv.py::modulated_deform_conv``):
bit-matching zero-padded bilinear sampling whenever the *vertical* offset
|dy| <= v_window (horizontal offsets are always exact); samples whose
vertical position falls outside the band contribute zero ("drop-far"),
unlike the XLA window path which clamps.  Forward-only: training
differentiates through the exact XLA path.

Constraints (checked by the wrapper): 3x3 kernel, stride 1, dilation 1,
Cin % 8 == 0, H >= BAND.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dcn_conv_pallas", "pallas_dcn_supported", "V_WINDOW_DEFAULT"]

V_WINDOW_DEFAULT = 4  # vertical offset coverage; band = 2*w + 4 rows


def _kernel(
    qy_ref,  # (1, 1, 9, W, 1) f32 — absolute vertical sample positions
    qx_ref,  # (1, 1, 9, W, 1) f32 — absolute horizontal sample positions
    m_ref,  # (1, 1, 9, W, 1) f32 — modulation mask
    ew_ref,  # (9, BAND*Cin, Cout) — conv weight broadcast over band rows
    x_hbm,  # (B, H, Cin, W) in HBM/ANY
    o_ref,  # (1, 1, W, Cout)
    band,  # VMEM scratch (BAND, Cin, W)
    sem,
    *,
    h: int,
    w: int,
    cin: int,
    cout: int,
    band_tot: int,
    v_window: int,
):
    b = pl.program_id(0)
    r = pl.program_id(1)
    s0 = jnp.clip(r - 1 - v_window, 0, h - band_tot)

    copy = pltpu.make_async_copy(x_hbm.at[b, pl.ds(s0, band_tot)], band, sem)
    copy.start()

    f32 = jnp.float32
    # lane coordinate maps (built once per step)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1).astype(f32)  # [x', x]
    # expanded band-row coordinate per (row, cin) lane: lane -> s0 + lane//cin
    rowc = (
        jax.lax.broadcasted_iota(jnp.int32, (w, band_tot * cin), 1) // cin
    ).astype(f32) + s0.astype(f32)  # [x', (row, c)]

    copy.wait()
    xband = band[...].reshape(band_tot * cin, w)  # [(row, c), x]

    acc = jnp.zeros((w, cout), jnp.float32)
    for k in range(9):
        qx = qx_ref[0, 0, k]  # (W, 1): x' on sublanes
        qy = qy_ref[0, 0, k]
        mk = m_ref[0, 0, k]
        # horizontal bilinear tent over the full row — exact, zero outside
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(col - qx))  # [x', x] f32
        g = jax.lax.dot_general(
            hx.astype(xband.dtype),
            xband,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # keep f32 operands true f32
        )  # [x', (row, c)]
        # vertical tent (absolute row coords -> correct zero-padding) x mask
        ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowc - qy)) * mk  # [x', (row, c)]
        fk = (g * ty).astype(ew_ref.dtype)
        acc = acc + jax.lax.dot_general(
            fk,
            ew_ref[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [x', cout]
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def pallas_dcn_supported(
    shape, kernel_size=(3, 3), stride=1, dilation=1, v_window=V_WINDOW_DEFAULT
) -> bool:
    n, h, w, cin = shape
    band = 2 * v_window + 4
    return (
        tuple(kernel_size) == (3, 3)
        and stride == 1
        and dilation == 1
        and cin % 8 == 0
        and h >= band
    )


@functools.partial(jax.jit, static_argnames=("v_window", "interpret"))
def dcn_conv_pallas(
    x: jnp.ndarray,  # (N, H, W, Cin)
    offset: jnp.ndarray,  # (N, H, W, 18) f32, (dy, dx) per tap row-major
    mask: jnp.ndarray,  # (N, H, W, 9) f32 (already sigmoided)
    weight: jnp.ndarray,  # (3, 3, Cin, Cout)
    bias=None,  # (Cout,)
    v_window: int = V_WINDOW_DEFAULT,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full modulated-deform-conv forward (SAME padding, stride 1)."""
    n, h, w, cin = x.shape
    cout = weight.shape[-1]
    band_tot = 2 * v_window + 4
    assert pallas_dcn_supported(x.shape, v_window=v_window), (x.shape, v_window)
    assert offset.shape == (n, h, w, 18) and mask.shape == (n, h, w, 9)

    f32 = jnp.float32
    # absolute sample positions per tap (reference base grid + offsets)
    ry = jnp.arange(h, dtype=f32)[:, None, None]  # (H,1,1)
    cx = jnp.arange(w, dtype=f32)[None, :, None]  # (1,W,1)
    ky = jnp.repeat(jnp.arange(-1.0, 2.0, dtype=f32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1.0, 2.0, dtype=f32), 3)
    off = offset.astype(f32).reshape(n, h, w, 9, 2)
    qy = ry[None] + ky + off[..., 0]  # (N, H, W, 9)
    qx = cx[None] + kx + off[..., 1]
    # -> (N, H, 9, W, 1): per-(row, tap) vectors land on sublanes (block
    # (1,1,9,W,1)) without in-kernel transposes; the trailing singleton
    # satisfies Mosaic's "lane dim == full array dim" block rule
    qy_t = qy.transpose(0, 1, 3, 2)[..., None]
    qx_t = qx.transpose(0, 1, 3, 2)[..., None]
    m_t = mask.astype(f32).transpose(0, 1, 3, 2)[..., None]

    x_t = x.transpose(0, 1, 3, 2)  # (N, H, Cin, W)
    # conv weight per tap, broadcast over band rows: EW[(row, c), cout]
    w9 = weight.reshape(9, cin, cout).astype(x.dtype)
    ew = jnp.broadcast_to(w9[:, None], (9, band_tot, cin, cout)).reshape(
        9, band_tot * cin, cout
    )

    kernel = functools.partial(
        _kernel, h=h, w=w, cin=cin, cout=cout, band_tot=band_tot, v_window=v_window
    )
    qspec = pl.BlockSpec(
        (1, 1, 9, w, 1), lambda b, r: (b, r, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(
                (9, band_tot * cin, cout),
                lambda b, r: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w, cout), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_tot, cin, w), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qy_t, qx_t, m_t, ew, x_t)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
