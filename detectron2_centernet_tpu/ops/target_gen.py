"""CenterNet ground-truth target generation, vectorized for TPU.

The reference runs ``gen_heatmap`` as a per-object Python/numpy loop *inside
the model's forward pass on every training iteration*
(``detectron2/data/detection_utils.py:600-705``, called from
``meta_arch/centernet.py:188``) — a host-side hot loop the SURVEY flags as the
#1 input-pipeline redesign.  Here the same math is one jit-compatible function
over a fixed-capacity object tensor: every object renders its gaussian against
the full output map via broadcasting, and per-class composition is a
``segment_max``.  Cost is O(max_objs * H/4 * W/4) dense VPU work (~2M floats
at 512x512), negligible next to the backbone and fully on-device.

Bit-level behaviors matched (SURVEY.md §7 "hard parts" #3):
  * ``gaussian_radius`` 3-case min-overlap-0.7 quadratic on ceil(h), ceil(w),
    truncated toward zero, floored at 0 (detection_utils.py:654-680);
  * gaussian sigma = (2r + 1) / 6, stamped on a window clipped to
    ``|dx| <= r, |dy| <= r`` and composited with max (draw_umich_gaussian,
    detection_utils.py:690-705);
  * centers quantized with int() truncation (positive coords → floor);
  * wh stored in output-map units, reg = ct - ct_int, ind = y * W + x.
"""

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def gaussian_radius(height: jnp.ndarray, width: jnp.ndarray, min_overlap: float = 0.7) -> jnp.ndarray:
    """Vectorized gaussian radius (reference detection_utils.py:654-680).

    height/width are box sizes in output-map pixels (already ceil'ed by the
    caller when matching the reference).  Returns float radii (un-truncated).
    """
    h, w = height, width

    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    # NOTE: the reference divides ALL three roots by 2 (detection_utils.py:
    # 654-680), not by 2a as the textbook quadratic would — an upstream
    # CenterNet quirk that must be matched bit-for-bit for target parity.
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 16 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2

    return jnp.minimum(jnp.minimum(r1, r2), r3)


@functools.partial(
    jax.jit, static_argnames=("num_classes", "out_h", "out_w", "down_ratio")
)
def gen_centernet_targets(
    boxes: jnp.ndarray,  # (M, 4) XYXY in *input* pixels
    classes: jnp.ndarray,  # (M,) int class ids in [0, num_classes)
    valid: jnp.ndarray,  # (M,) bool — slot holds a real object
    num_classes: int,
    out_h: int,
    out_w: int,
    down_ratio: int = 4,
) -> Dict[str, jnp.ndarray]:
    """Render CenterNet training targets for one image.

    Returns the reference ``gen_heatmap`` dict with HWC heatmap layout:
      hm (out_h, out_w, num_classes), wh (M, 2), reg (M, 2), ind (M,) int32,
      reg_mask (M,) float32.
    """
    m = boxes.shape[0]
    b = boxes.astype(jnp.float32) / float(down_ratio)
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    ok = valid & (h > 0) & (w > 0)

    radius = gaussian_radius(jnp.ceil(h), jnp.ceil(w))
    # int() truncation then max(0, .) as in the reference.
    radius = jnp.maximum(radius.astype(jnp.int32), 0).astype(jnp.float32)

    cx = (b[:, 0] + b[:, 2]) / 2
    cy = (b[:, 1] + b[:, 3]) / 2
    cx_int = cx.astype(jnp.int32)
    cy_int = cy.astype(jnp.int32)

    # Dense gaussian per object over the full map, masked to the stamp window.
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dy = ys[None] - cy_int[:, None, None].astype(jnp.float32)  # (M, H, W)
    dx = xs[None] - cx_int[:, None, None].astype(jnp.float32)
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2 * sigma * sigma)[:, None, None])
    in_window = (jnp.abs(dx) <= radius[:, None, None]) & (
        jnp.abs(dy) <= radius[:, None, None]
    )
    g = jnp.where(in_window & ok[:, None, None], g, 0.0)

    # Compose per class with max. Invalid slots were zeroed above, so sending
    # them to segment 0 cannot raise any value; classes without objects come
    # back as -inf and are clamped to the empty-heatmap value 0.
    seg_ids = jnp.where(ok, classes, 0).astype(jnp.int32)
    hm = jax.ops.segment_max(g, seg_ids, num_segments=num_classes)  # (C, H, W)
    hm = jnp.maximum(hm, 0.0)
    hm = jnp.transpose(hm, (1, 2, 0))  # HWC

    okf = ok.astype(jnp.float32)
    wh = jnp.stack([w, h], axis=1) * okf[:, None]
    reg = jnp.stack([cx - cx_int, cy - cy_int], axis=1) * okf[:, None]
    ind = jnp.where(ok, cy_int * out_w + cx_int, 0).astype(jnp.int32)

    return {"hm": hm, "wh": wh, "reg": reg, "ind": ind, "reg_mask": okf}


gen_centernet_targets_batch = jax.vmap(
    gen_centernet_targets, in_axes=(0, 0, 0, None, None, None, None), out_axes=0
)
"""Batched variant: boxes (N, M, 4), classes (N, M), valid (N, M)."""
