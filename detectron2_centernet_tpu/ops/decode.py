"""CenterNet NMS-free detection decode.

Reference semantics: ``ctdet_decode`` (meta_arch/centernet.py:399-458) —
3x3 max-pool peak suppression (``_nms``), per-class-then-global top-K
(``_topk``), sub-pixel offset add, wh gather, box assembly scaled by the
down ratio.  The per-class top-K followed by a global top-K over the C*K
candidates selects exactly the global top-K of the suppressed heatmap, so we
run one ``lax.top_k`` over the (C*H*W)-flattened scores — fewer passes, same
result set.

Everything is fixed-shape: the output is always K slots per image; callers
apply the score threshold as a mask (host side materializes only valid rows).
The whole function is fusable XLA (reduce_window + top_k + gathers); a Pallas
fused variant can slot in behind the same signature later.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def heat_nms(hm: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of an NHWC heatmap (reference ``_nms``)."""
    neg_inf = jnp.array(-jnp.inf, dtype=hm.dtype)
    hmax = jax.lax.reduce_window(
        hm,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return jnp.where(hmax == hm, hm, jnp.zeros_like(hm))


@functools.partial(
    jax.jit, static_argnames=("k", "down_ratio", "score_dtype", "approx")
)
def ctdet_decode(
    hm: jnp.ndarray,  # (N, H, W, C) sigmoided+clamped heatmap
    wh: jnp.ndarray,  # (N, H, W, 2)
    reg: jnp.ndarray,  # (N, H, W, 2)
    k: int = 100,
    down_ratio: int = 4,
    score_dtype=None,
    approx: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode top-k detections per image.

    Returns (boxes (N, K, 4) XYXY in input pixels, scores (N, K) f32,
    classes (N, K) int32), sorted by descending score.

    ``score_dtype=jnp.bfloat16`` runs the bandwidth-bound peak suppression +
    top-k over a half-width heatmap (the (N,H,W,C) map is ~170 MB at f32 for
    the 512^2/B=32 production shape and decode is HBM-bound); scores lose
    ~3 decimal digits, which can permute near-equal candidates but leaves
    box coordinates (always gathered/computed in f32) untouched.

    ``approx=True`` selects candidates with ``jax.lax.approx_max_k``
    (recall_target 0.99) — the TPU's hardware PartialReduce, ~4x faster
    than the exact sort on production shapes. With k=100 out of 1.3M
    suppressed peaks the missed mass sits at the score-threshold floor.
    """
    n, h, w, c = hm.shape
    if score_dtype is not None:
        hm = hm.astype(score_dtype)
    heat = heat_nms(hm)

    # Flatten to (N, C*H*W) in (class, y, x) index order to mirror the
    # reference's NCHW flattening. Tie-break parity with the reference decode
    # holds only with approx=False and score_dtype=None (f32): approx_max_k
    # can drop true candidates (recall 0.99) and bf16 collapses near-equal
    # scores. TEST.EXACT_MODE forces both off for parity-sensitive eval.
    flat = jnp.transpose(heat, (0, 3, 1, 2)).reshape(n, c * h * w)

    if approx:
        scores, inds = jax.lax.approx_max_k(flat, k, recall_target=0.99)
    else:
        scores, inds = jax.lax.top_k(flat, k)  # (N, K)
    scores = scores.astype(jnp.float32)
    classes = (inds // (h * w)).astype(jnp.int32)
    pix = inds % (h * w)  # (N, K) flattened y*w + x
    ys = (pix // w).astype(jnp.float32)
    xs = (pix % w).astype(jnp.float32)

    reg_flat = reg.reshape(n, h * w, 2).astype(jnp.float32)
    reg_k = jnp.take_along_axis(reg_flat, pix[:, :, None], axis=1)  # (N, K, 2)
    xs = xs + reg_k[:, :, 0]
    ys = ys + reg_k[:, :, 1]

    wh_flat = wh.reshape(n, h * w, 2).astype(jnp.float32)
    wh_k = jnp.take_along_axis(wh_flat, pix[:, :, None], axis=1)  # (N, K, 2)

    half_w = wh_k[:, :, 0] / 2
    half_h = wh_k[:, :, 1] / 2
    boxes = jnp.stack(
        [xs - half_w, ys - half_h, xs + half_w, ys + half_h], axis=2
    ) * float(down_ratio)
    return boxes, scores, classes
