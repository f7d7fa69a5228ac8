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


def _blocked_window_sample(
    x: jnp.ndarray,  # (N, H, W, C)
    py: jnp.ndarray,  # (N, Ho, Wo, K) float sample rows (pre-clamp)
    px: jnp.ndarray,
    mask: jnp.ndarray,  # (N, Ho, Wo, K)
    window: int,  # R: offsets clamped to [-R, R] around the rigid-grid pos
    base_y: jnp.ndarray,  # (Ho, Wo, K) rigid-grid positions
    base_x: jnp.ndarray,
    block: int = 4,
) -> jnp.ndarray:
    """Blocked windowed sampling: ONE (Wp, Wp, C) patch gather per
    ``block x block`` output tile + bilinear-as-matmul within the patch.

    Wp = block + 2*R + 3 covers every clamped sample's corners for a 3x3
    dilation-1 kernel.  ~64x fewer gather descriptors than per-sample corner
    fetches; the in-patch interpolation becomes (B*K, Wp^2) x (Wp^2, C)
    batched matmuls on the MXU.  Returns (N, Ho, Wo, K, C) modulated samples.
    """
    n, h, w, c = x.shape
    _, ho, wo, k = py.shape
    s = block
    r = window
    wp = s + 2 * r + 3
    by, bx = ho // s, wo // s

    # clamp offsets: sample pos within [base - R, base + R]
    py = jnp.clip(py, base_y[None] - r, base_y[None] + r)
    px = jnp.clip(px, base_x[None] - r, base_x[None] + r)

    # patch base per block, clipped to valid gather starts
    blk_y0 = jnp.clip(
        jnp.arange(by, dtype=jnp.int32) * s - 1 - r, 0, max(h - wp, 0)
    )  # (By,)
    blk_x0 = jnp.clip(
        jnp.arange(bx, dtype=jnp.int32) * s - 1 - r, 0, max(w - wp, 0)
    )

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    starts = jnp.stack(
        jnp.meshgrid(blk_y0, blk_x0, indexing="ij"), axis=-1
    ).reshape(by * bx, 2)

    def per_image(xi):
        return jax.lax.gather(
            xi, starts, dnums, slice_sizes=(wp, wp, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (By*Bx, Wp, Wp, C)

    patch = jax.vmap(per_image)(x)  # (N, B, Wp, Wp, C)

    # per-sample weights against actual patch coordinates
    py_b = py.reshape(n, by, s, bx, s, k).transpose(0, 1, 3, 2, 4, 5)  # (N,By,Bx,s,s,K)
    px_b = px.reshape(n, by, s, bx, s, k).transpose(0, 1, 3, 2, 4, 5)
    rows = blk_y0[None, :, None].astype(py.dtype) + jax.lax.broadcasted_iota(
        py.dtype, (1, by, wp), 2
    )  # (1, By, Wp)
    cols = blk_x0[None, :, None].astype(px.dtype) + jax.lax.broadcasted_iota(
        px.dtype, (1, bx, wp), 2
    )
    wy = jnp.maximum(
        0.0, 1.0 - jnp.abs(py_b[..., None] - rows[:, :, None, None, None, None, :])
    )  # (N, By, Bx, s, s, K, Wp)
    wx = jnp.maximum(
        0.0, 1.0 - jnp.abs(px_b[..., None] - cols[:, None, :, None, None, None, :])
    )
    mask_b = mask.reshape(n, by, s, bx, s, k).transpose(0, 1, 3, 2, 4, 5)
    wy = wy * mask_b[..., None]  # fold modulation into the row weights

    # sampled[..., k, c] = sum_{j,i} wy_j * wx_i * patch[j, i, c] as two
    # chained contractions; XLA fuses them without materializing the
    # (Q, Wp, C) intermediate (measured faster than one dense
    # (Q, Wp^2) x (Wp^2, C) GEMM at block 8)
    nb = n * by * bx
    q = s * s * k
    wy2 = wy.reshape(nb, q, wp)
    wx2 = wx.reshape(nb, q, wp)
    patch2 = patch.reshape(nb, wp, wp, c)
    # dtype-following: bf16 inputs interpolate with bf16 weights (<=0.4%
    # relative error on weights in [0,1] — negligible for inference); f32
    # inputs keep full precision for training/parity
    dt = patch2.dtype
    tmp = jnp.einsum(
        "bqj,bjic->bqic", wy2.astype(dt), patch2, preferred_element_type=dt
    )
    out = jnp.einsum(
        "bqi,bqic->bqc", wx2.astype(dt), tmp, preferred_element_type=jnp.float32
    )  # (NB, Q, C)
    out = out.reshape(n, by, bx, s, s, k, c).transpose(0, 1, 3, 2, 4, 5, 6)
    return out.reshape(n, ho, wo, k, c)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "stride", "dilation", "window")
)
def modulated_deform_conv(
    x: jnp.ndarray,  # (N, H, W, Cin)
    offset: jnp.ndarray,  # (N, Ho, Wo, 2*K)
    mask: jnp.ndarray,  # (N, Ho, Wo, K)
    weight: jnp.ndarray,  # (KH, KW, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    kernel_size: Tuple[int, int] = (3, 3),
    stride: int = 1,
    dilation: int = 1,
    window: int = 0,
) -> jnp.ndarray:
    """Modulated deformable convolution, SAME padding.

    Semantics of ``_C.modulated_deform_conv_forward``
    (reference csrc/deformable/deform_conv_cuda.cu) with deformable_groups=1.
    Differentiable through JAX autodiff (gather → scatter-add transpose).

    ``window > 0`` selects the blocked fast path: offsets are CLAMPED to
    ``[-window, +window]`` and sampling uses one patch gather per 4x4 output
    block (_blocked_window_sample) — numerically identical to the exact path
    whenever |offset| <= window (tested), far fewer gather descriptors.
    Requires stride 1, 3x3 kernel, dims divisible by 4, dims >= patch size.
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

    # pick the largest block size the shape supports (8 maps best onto the
    # MXU batched-GEMM; 4 covers small maps)
    block = 0
    for cand in (8, 4):
        wp = cand + 2 * window + 3
        if ho % cand == 0 and wo % cand == 0 and h >= wp and w >= wp:
            block = cand
            break
    use_window = (
        window > 0
        and stride == 1
        and (kh, kw) == (3, 3)
        and dilation == 1
        and ho == h
        and wo == w
        and block > 0
    )
    if use_window:
        sampled = _blocked_window_sample(
            x, py, px, mask.astype(jnp.float32), window, base_y, base_x, block
        )  # (N, Ho, Wo, K, Cin), mask already folded in
        sampled = sampled.astype(x.dtype)
    else:
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
