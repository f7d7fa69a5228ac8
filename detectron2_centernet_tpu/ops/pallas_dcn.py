"""Pallas TPU kernel: modulated deformable 3x3 conv (DCNv2) forward.

Replaces the reference's ``modulated_deformable_im2col`` CUDA kernels
(``/root/reference/detectron2/layers/csrc/deformable/deform_conv_cuda_kernel.cu:786-952``)
with an MXU-native formulation.  Per-pixel 2D deformable sampling is NOT
separable (the vertical sample position varies with the output column), so
instead of gather ops the kernel expresses bilinear interpolation as two
matrix contractions per (output row, tap):

  1. **Horizontal tent matmul** — ``G = Xsub @ HkT`` where
     ``HkT[x, x'] = max(0, 1 - |x - Qx_k(r, x')|)`` is the bilinear "tent"
     over the *full* row (horizontal offsets are EXACT/unbounded) and
     ``Xsub`` is the ``2*vw + 2``-row vertical sub-band a tap can reach,
     flattened row-major to ``[(row, cin), x]``.  One 128-deep MXU
     contraction replaces all horizontal gathers.
  2. **Vertical tent + conv fold** — the sub-band-wide vertical tent
     (× modulation mask) is broadcast across channels on the VPU, then a
     second MXU dot with the tap's conv weight *broadcast over band rows*
     (``EWT_k[cout, (row, cin)] = W_k[cin, cout]``) simultaneously contracts
     band rows, input channels and accumulates the 3x3-conv output — no
     9*Cin patch tensor ever touches HBM.

Every operand keeps its natural Mosaic layout: tents are built transposed
(input coordinate on sublanes via iota, per-output-pixel positions on
lanes), both dots are plain NN contractions, the output leaves the kernel
channel-major ``(B, H, Cout, W)`` and is transposed once by XLA.  Each grid
step owns ``r_blk`` output rows of one image so the band DMA amortizes;
all loops are statically unrolled.

Semantics vs the exact op (``deform_conv.py::modulated_deform_conv``):
bit-matching zero-padded bilinear sampling whenever the *vertical* offset
|dy| <= v_window (horizontal offsets are always exact); samples whose
vertical position falls outside the band contribute zero ("drop-far"),
unlike the XLA window path which clamps.  Forward-only: training
differentiates through the exact XLA path.

Constraints (checked by ``pallas_dcn_supported``): 3x3 kernel, stride 1,
dilation 1, Cin % 8 == 0.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dcn_conv_pallas", "pallas_dcn_supported", "V_WINDOW_DEFAULT"]

V_WINDOW_DEFAULT = 4  # vertical offset coverage

_KY = (-1, -1, -1, 0, 0, 0, 1, 1, 1)  # tap row offsets, row-major 3x3


def _pick_r_blk(h: int) -> int:
    for cand in (8, 4, 2, 1):
        if h % cand == 0:
            return cand
    return 1


def _kernel(
    qy_ref,  # (1, r_blk, 9, W) f32 — absolute vertical sample positions
    qx_ref,  # (1, r_blk, 9, W) f32 — absolute horizontal positions
    m_ref,  # (1, r_blk, 9, W) f32 — modulation mask
    ewt_ref,  # (9, Cout, SUB*Cin) — conv weight broadcast over sub-band rows
    x_hbm,  # (B, H, Cin, W) in HBM
    o_ref,  # (1, r_blk, Cout, W)
    band,  # VMEM scratch (BAND, Cin, W)
    sem,
    *,
    h: int,
    w: int,
    cin: int,
    cout: int,
    band_tot: int,
    sub_rows: int,
    v_window: int,
    r_blk: int,
):
    b = pl.program_id(0)
    rb = pl.program_id(1)
    r0 = rb * r_blk
    s0 = jnp.clip(r0 - 1 - v_window, 0, h - band_tot)

    copy = pltpu.make_async_copy(x_hbm.at[b, pl.ds(s0, band_tot)], band, sem)
    copy.start()

    f32 = jnp.float32
    # input x-coordinate on sublanes, output pixel x' on lanes
    xiota = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0).astype(f32)
    subiota = jax.lax.broadcasted_iota(jnp.int32, (sub_rows, 1), 0).astype(f32)

    copy.wait()

    for j in range(r_blk):
        acc = jnp.zeros((cout, w), jnp.float32)
        for k in range(9):
            qx = qx_ref[0, j, k].reshape(1, w)
            qy = qy_ref[0, j, k].reshape(1, w)
            mk = m_ref[0, j, k].reshape(1, w)
            # the sub-band this tap can reach for this output row
            a = jnp.clip(r0 + j + _KY[k] - v_window - s0, 0, band_tot - sub_rows)
            xs = band[pl.ds(a, sub_rows)].reshape(sub_rows * cin, w)
            # horizontal bilinear tent over the full row — exact, 0 outside
            hxt = jnp.maximum(0.0, 1.0 - jnp.abs(xiota - qx))  # [x, x']
            g = jax.lax.dot_general(
                xs,
                hxt.astype(xs.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if xs.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )  # [(row, c), x']
            # vertical tent on absolute row coords (correct zero-padding),
            # modulation folded in, broadcast channel-minor across sublanes
            rowc = subiota + (s0 + a).astype(f32)  # [row, 1]
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(rowc - qy)) * mk  # [row, x']
            ty3 = jnp.broadcast_to(
                ty[:, None, :], (sub_rows, cin, w)
            ).reshape(sub_rows * cin, w)
            fk = (g * ty3).astype(ewt_ref.dtype)
            acc = acc + jax.lax.dot_general(
                ewt_ref[k],
                fk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if fk.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )  # [cout, x']
        o_ref[0, j] = acc.astype(o_ref.dtype)


def pallas_dcn_supported(
    shape,
    kernel_size=(3, 3),
    stride=1,
    dilation=1,
    v_window=V_WINDOW_DEFAULT,
    interpret=False,
) -> bool:
    n, h, w, cin = shape
    return (
        tuple(kernel_size) == (3, 3)
        and stride == 1
        and dilation == 1
        and cin % 8 == 0
        and h >= 2
        # Mosaic requires the innermost (lane) dim 128-tiled; smaller maps
        # (64^2 and below in DLA-34 at 512^2) take the exact XLA path
        and (interpret or w % 128 == 0)
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
    assert pallas_dcn_supported(
        x.shape, v_window=v_window, interpret=interpret
    ), (x.shape, v_window)
    assert offset.shape == (n, h, w, 18) and mask.shape == (n, h, w, 9)
    r_blk = _pick_r_blk(h)
    band_tot = min(h, r_blk + 2 * v_window + 3)
    sub_rows = min(band_tot, 2 * v_window + 2)

    f32 = jnp.float32
    ry = jnp.arange(h, dtype=f32)[:, None, None]  # (H,1,1)
    cx = jnp.arange(w, dtype=f32)[None, :, None]  # (1,W,1)
    ky = jnp.repeat(jnp.arange(-1.0, 2.0, dtype=f32), 3)  # (9,)
    kx = jnp.tile(jnp.arange(-1.0, 2.0, dtype=f32), 3)
    off = offset.astype(f32).reshape(n, h, w, 9, 2)
    qy = (ry[None] + ky + off[..., 0]).transpose(0, 1, 3, 2)  # (N, H, 9, W)
    qx = (cx[None] + kx + off[..., 1]).transpose(0, 1, 3, 2)
    m_t = mask.astype(f32).transpose(0, 1, 3, 2)

    x_t = x.transpose(0, 1, 3, 2)  # (N, H, Cin, W)
    # conv weight per tap, transposed and broadcast over sub-band rows:
    # EWT[k, cout, (row, cin)] = W[k, cin, cout]
    w9t = weight.reshape(9, cin, cout).astype(x.dtype).transpose(0, 2, 1)
    ewt = jnp.broadcast_to(
        w9t[:, :, None, :], (9, cout, sub_rows, cin)
    ).reshape(9, cout, sub_rows * cin)

    kernel = functools.partial(
        _kernel,
        h=h,
        w=w,
        cin=cin,
        cout=cout,
        band_tot=band_tot,
        sub_rows=sub_rows,
        v_window=v_window,
        r_blk=r_blk,
    )
    qspec = pl.BlockSpec(
        (1, r_blk, 9, w), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n, h // r_blk),
        in_specs=[
            qspec,
            qspec,
            qspec,
            pl.BlockSpec(
                (9, cout, sub_rows * cin),
                lambda b, r: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # full feature map stays in HBM; the kernel DMAs row bands
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, r_blk, cout, w), lambda b, r: (b, r, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, cout, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band_tot, cin, w), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(qy, qx, m_t, ewt, x_t)
    out = out.transpose(0, 1, 3, 2)  # (N, H, W, Cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
