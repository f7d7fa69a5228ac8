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
    x_flat: jnp.ndarray,  # (N, H*W, C)
    py: jnp.ndarray,  # (N, P) float sample rows
    px: jnp.ndarray,  # (N, P) float sample cols
    height: int,
    width: int,
) -> jnp.ndarray:
    """Bilinear sample with zero padding outside the image. Returns (N, P, C).

    Matches the CUDA kernel's border rule (corners outside [0,H)x[0,W)
    contribute nothing), i.e. sampling from a zero-extended image.
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    out = None
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        w = (1.0 - jnp.abs(py - yy)) * (1.0 - jnp.abs(px - xx))
        valid = (yy >= 0) & (yy < height) & (xx >= 0) & (xx < width)
        w = jnp.where(valid, w, 0.0)
        idx = (
            jnp.clip(yy, 0, height - 1).astype(jnp.int32) * width
            + jnp.clip(xx, 0, width - 1).astype(jnp.int32)
        )
        vals = jnp.take_along_axis(x_flat, idx[:, :, None], axis=1)  # (N, P, C)
        contrib = vals * w[:, :, None].astype(vals.dtype)
        out = contrib if out is None else out + contrib
    return out


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

    x_flat = x.reshape(n, h * w, cin)
    p = ho * wo * k
    sampled = _bilinear_gather(
        x_flat, py.reshape(n, p), px.reshape(n, p), h, w
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
