"""ROIAlign for TPU (XLA gather formulation).

The reference implements this as ~1k lines of C++/CUDA
(``detectron2/layers/csrc/ROIAlign/*``, python wrapper ``layers/roi_align.py``)
with the ``aligned=true`` half-pixel fix.  Here each output bin averages
``sampling_ratio^2`` bilinear samples; all sample coordinates are computed in
closed form and fetched with one batched gather, then reduced — the irregular
access becomes a single gather stage and the arithmetic stays on the VPU.
Differentiable via the gather's scatter-add transpose (the CUDA backward
kernel's job, ``ROIAlign_cuda.cu`` backward).

Multi-level pooling (``ROIPooler``, reference ``modeling/poolers.py:98``) uses
the FPN level-assignment formula and, keeping shapes static, evaluates each
roi at every level and selects its assigned level's result.
"""

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["roi_align", "multilevel_roi_align", "assign_boxes_to_levels"]


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); ys/xs (...,) -> (..., C), zero outside borders
    (matches the CUDA kernel: samples with y/x in [-1, H) are clamped,
    beyond that contribute zero)."""
    h, w, c = feat.shape
    # the reference clamps coords in (-1, 0) to 0 and kills y <= -1 or >= H
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = y - y0
    lx = x - x0

    flat = feat.reshape(h * w, c)

    def g(yy, xx):
        idx = (yy * w + xx).astype(jnp.int32).reshape(-1)
        return flat[idx].reshape(ys.shape + (c,))

    v00 = g(y0, x0)
    v01 = g(y0, x1)
    v10 = g(y1, x0)
    v11 = g(y1, x1)
    out = (
        v00 * ((1 - ly) * (1 - lx))[..., None]
        + v01 * ((1 - ly) * lx)[..., None]
        + v10 * (ly * (1 - lx))[..., None]
        + v11 * (ly * lx)[..., None]
    )
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(
    jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned")
)
def roi_align(
    features: jnp.ndarray,  # (N, H, W, C)
    boxes: jnp.ndarray,  # (R, 4) XYXY in input coords of `features`' scale
    batch_idx: jnp.ndarray,  # (R,) int32 image index per roi
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """(R, P, P, C) pooled features.

    sampling_ratio must be > 0 (the reference's adaptive 0 mode picks
    ceil(roi/bin) per roi — dynamic; configs use 0 but the standard heads
    behave equivalently with 2 samples/bin at these resolutions).
    """
    assert sampling_ratio > 0
    p = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0
    bx = boxes * spatial_scale
    x0 = bx[:, 0] - offset
    y0 = bx[:, 1] - offset
    x1 = bx[:, 2] - offset
    y1 = bx[:, 3] - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_h = roi_h / p
    bin_w = roi_w / p
    # sample grid: (P, S) fractional positions within the roi
    iy = (jnp.arange(p)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)  # (P, S)
    ys = y0[:, None, None] + bin_h[:, None, None] * iy[None]  # (R, P, S)
    xs = x0[:, None, None] + bin_w[:, None, None] * iy[None]

    def one_roi(b_idx, ys_r, xs_r):
        feat = features[b_idx]
        yy = jnp.broadcast_to(ys_r[:, :, None, None], (p, s, p, s))
        xx = jnp.broadcast_to(xs_r[None, None, :, :], (p, s, p, s))
        samples = _bilinear_sample(feat, yy, xx)  # (P, S, P, S, C)
        return samples.mean(axis=(1, 3))  # (P, P, C)

    return jax.vmap(one_roi)(batch_idx, ys, xs)


def assign_boxes_to_levels(
    boxes: jnp.ndarray,  # (R, 4)
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN level assignment (reference poolers.py:22-63, eqn. 1 of the FPN
    paper): level = floor(k0 + log2(sqrt(area)/224))."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    sqrt_area = jnp.sqrt(jnp.maximum(area, 1e-12))
    lvl = jnp.floor(
        canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8)
    )
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],  # per level (N, Hl, Wl, C)
    strides: Sequence[int],
    boxes: jnp.ndarray,  # (R, 4) XYXY input coords
    batch_idx: jnp.ndarray,  # (R,)
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign across an FPN pyramid with level assignment. (R, P, P, C)."""
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    levels = assign_boxes_to_levels(boxes, min_level, max_level)
    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        pooled = roi_align(
            feat, boxes, batch_idx, 1.0 / stride, output_size, sampling_ratio
        )
        mask = (levels == min_level + i).astype(pooled.dtype)[:, None, None, None]
        out = pooled * mask if out is None else out + pooled * mask
    return out
