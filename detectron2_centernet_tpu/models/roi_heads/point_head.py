"""PointRend-style point head (the reference's ``projects/PointRend``
capability): refine coarse mask predictions at adaptively chosen points.

TPU redesign with static shapes throughout:
  * training samples a FIXED number of points per roi with the paper's
    biased strategy (k·N candidates, take the beta·N most uncertain, fill
    the rest uniformly at random);
  * the point head is a shared MLP over [fine feature, coarse logit] point
    vectors — batched matmuls on the MXU;
  * inference runs a fixed number of subdivision steps: upsample the mask
    2x, re-predict the N most uncertain points, scatter the refinements.
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PointHead", "sample_uncertain_points", "point_sample", "refine_mask_with_points"]


def point_sample(feat: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample ``feat`` (H, W, C) at normalized coords (P, 2) in
    [0, 1] (align_corners=False convention). Returns (P, C)."""
    h, w, c = feat.shape
    x = coords[:, 0] * w - 0.5
    y = coords[:, 1] * h - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y), 0, h - 2)
    lx = jnp.clip(x - x0, 0.0, 1.0)
    ly = jnp.clip(y - y0, 0.0, 1.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    flat = feat.reshape(h * w, c)

    def g(yy, xx):
        return flat[yy * w + xx]

    v00 = g(y0i, x0i)
    v01 = g(y0i, x0i + 1)
    v10 = g(y0i + 1, x0i)
    v11 = g(y0i + 1, x0i + 1)
    return (
        v00 * ((1 - ly) * (1 - lx))[:, None]
        + v01 * ((1 - ly) * lx)[:, None]
        + v10 * (ly * (1 - lx))[:, None]
        + v11 * (ly * lx)[:, None]
    )


def sample_uncertain_points(
    logits: jnp.ndarray,  # (H, W) coarse mask logits for the gt class
    rng: jax.Array,
    num_points: int,
    oversample: int = 3,
    importance: float = 0.75,
) -> jnp.ndarray:
    """The paper's biased sampling (fixed shapes): draw k*N random points,
    keep the beta*N most uncertain (|logit| smallest), fill with uniform.
    Returns normalized coords (num_points, 2)."""
    k = oversample * num_points
    r1, r2 = jax.random.split(rng)
    cand = jax.random.uniform(r1, (k, 2))
    vals = point_sample(logits[:, :, None], cand)[:, 0]
    uncertainty = -jnp.abs(vals)
    n_imp = int(importance * num_points)
    _, idx = jax.lax.top_k(uncertainty, n_imp)
    imp_pts = cand[idx]
    rand_pts = jax.random.uniform(r2, (num_points - n_imp, 2))
    return jnp.concatenate([imp_pts, rand_pts], axis=0)


class PointHead(nn.Module):
    """Shared MLP over [fine-feature, coarse-logit] point vectors
    (reference PointRend StandardPointHead)."""

    num_classes: int
    fc_dim: int = 256
    num_fc: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
        """fine (..., P, Cf), coarse (..., P, C) -> point logits (..., P, C)."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fc):
            x = nn.Dense(self.fc_dim, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = nn.relu(x)
            # the reference re-appends the coarse prediction at every layer
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="predictor")(
            x.astype(jnp.float32)
        )


def refine_mask_with_points(
    mask_logits: jnp.ndarray,  # (H, W) one class's mask logits
    fine_feat: jnp.ndarray,  # (Hf, Wf, Cf) fine feature for this roi
    point_fn,  # (fine (P,Cf), coarse (P,1)) -> (P, 1) refined logits
    num_points: int,
    steps: int = 2,
) -> jnp.ndarray:
    """Inference-time subdivision: repeatedly 2x-upsample and re-predict the
    most uncertain points (fixed count per step)."""
    m = mask_logits
    for _ in range(steps):
        h, w = m.shape
        m = jax.image.resize(m, (h * 2, w * 2), method="bilinear")
        hw = m.shape[0] * m.shape[1]
        k = min(num_points, hw)
        flat = m.reshape(-1)
        _, idx = jax.lax.top_k(-jnp.abs(flat), k)
        ys = (idx // m.shape[1]).astype(jnp.float32)
        xs = (idx % m.shape[1]).astype(jnp.float32)
        coords = jnp.stack(
            [(xs + 0.5) / m.shape[1], (ys + 0.5) / m.shape[0]], axis=1
        )
        fine = point_sample(fine_feat, coords)
        coarse = flat[idx][:, None]
        refined = point_fn(fine, coarse)[:, 0]
        m = m.reshape(-1).at[idx].set(refined).reshape(m.shape)
    return m
