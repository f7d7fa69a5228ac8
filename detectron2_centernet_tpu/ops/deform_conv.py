"""Modulated deformable convolution (DCNv2) for TPU.

The reference implements this as ~2.8k lines of CUDA
(``detectron2/layers/csrc/deformable/*``: ``modulated_deformable_im2col`` +
cuBLAS GEMM, dispatched from ``layers/deform_conv.py:180-309``).  On TPU we
express the same math as XLA-native operations:

  1. bilinear sampling of the input at per-pixel offset positions — four
     ``take_along_axis`` gathers over a flattened spatial axis (gather lowers
     to TPU's native dynamic-gather; its transpose — scatter-add — gives the
     data/offset/mask gradients for free through JAX autodiff);
  2. modulation by the per-tap sigmoid mask;
  3. one large ``(N*H*W, K*Cin) x (K*Cin, Cout)`` matmul that lands on the MXU.

This keeps the FLOP-heavy contraction on the systolic array and turns the
irregular memory access into a single fused gather stage, instead of
translating the CUDA im2col loop.  Layout is NHWC (TPU-native); the reference
is NCHW.

Offset/mask channel convention matches DCNv2 so torch checkpoints can be
imported: for tap ``k`` in row-major (ky, kx) order, ``offset[..., 2k]`` is the
**y** displacement and ``offset[..., 2k+1]`` the **x** displacement;
``mask[..., k]`` is the (already sigmoided) modulation scalar.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(
    x: jnp.ndarray,  # (N, H, W, C)
    py: jnp.ndarray,  # (N, P) float sample rows
    px: jnp.ndarray,  # (N, P) float sample cols
) -> jnp.ndarray:
    """Bilinear sample with zero padding outside the image. Returns (N, P, C).

    One (2, 2, C) patch gather per sample instead of four row gathers — on
    TPU this measures ~2.5x faster (the four corners share one descriptor).
    Corner weights are computed from the *clamped* patch coordinates with
    ``max(0, 1 - |p - coord|)``, which reproduces the CUDA kernel's border
    rule (corners outside [0,H)x[0,W) contribute nothing) without branching.
    """
    n, h, w, c = x.shape
    y0 = jnp.clip(jnp.floor(py), 0, h - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(px), 0, w - 2).astype(jnp.int32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def per_image(xi, yi, xj):
        starts = jnp.stack([yi, xj], axis=1)  # (P, 2)
        return jax.lax.gather(
            xi, starts, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (P, 2, 2, C)

    patch = jax.vmap(per_image)(x, y0, x0)

    # per-corner weights from actual patch coordinates (zero outside window)
    rows = y0[..., None].astype(py.dtype) + jnp.asarray([0.0, 1.0], py.dtype)  # (N,P,2)
    cols = x0[..., None].astype(px.dtype) + jnp.asarray([0.0, 1.0], px.dtype)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[..., None] - rows))  # (N, P, 2)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[..., None] - cols))
    wgt = (wy[..., :, None] * wx[..., None, :]).astype(patch.dtype)  # (N, P, 2, 2)
    return jnp.einsum("npjk,npjkc->npc", wgt, patch)


@functools.partial(jax.jit, static_argnames=("kernel_size", "stride", "dilation"))
def modulated_deform_conv(
    x: jnp.ndarray,  # (N, H, W, Cin)
    offset: jnp.ndarray,  # (N, Ho, Wo, 2*K)
    mask: jnp.ndarray,  # (N, Ho, Wo, K)
    weight: jnp.ndarray,  # (KH, KW, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    kernel_size: Tuple[int, int] = (3, 3),
    stride: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Modulated deformable convolution, SAME padding.

    Semantics of ``_C.modulated_deform_conv_forward``
    (reference csrc/deformable/deform_conv_cuda.cu) with deformable_groups=1.
    Differentiable through JAX autodiff (gather → scatter-add transpose).
    """
    n, h, w, cin = x.shape
    kh, kw = kernel_size
    k = kh * kw
    pad_h = dilation * (kh - 1) // 2
    pad_w = dilation * (kw - 1) // 2
    ho = (h + 2 * pad_h - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * pad_w - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (n, ho, wo, 2 * k), (offset.shape, (n, ho, wo, 2 * k))
    assert mask.shape == (n, ho, wo, k)

    # Base sampling grid: output pixel (i, j), tap (ky, kx) samples input at
    # (i*stride - pad + ky*dilation + dy, j*stride - pad + kx*dilation + dx).
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - pad_h  # (Ho,)
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - pad_w  # (Wo,)
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation  # (KH,)
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation  # (KW,)
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,KH,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,KW)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, k)

    off = offset.astype(jnp.float32).reshape(n, ho, wo, k, 2)
    py = base_y[None] + off[..., 0]  # (N, Ho, Wo, K)
    px = base_x[None] + off[..., 1]

    p = ho * wo * k
    sampled = _bilinear_gather(
        x, py.reshape(n, p), px.reshape(n, p)
    )  # (N, P, Cin)
    sampled = sampled.reshape(n, ho, wo, k, cin)
    sampled = sampled * mask[..., None].astype(sampled.dtype)

    # One MXU-sized contraction over (tap, channel).
    lhs = sampled.reshape(n * ho * wo, k * cin)
    rhs = weight.astype(sampled.dtype).reshape(k * cin, -1)
    # HIGHEST keeps float32 operands at true f32 (jax's default truncates
    # f32 matmul inputs to bf16); bf16 operands — the production inference
    # path — hit the MXU natively either way, with f32 accumulation.
    out = jnp.dot(
        lhs,
        rhs,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out.reshape(n, ho, wo, -1).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
