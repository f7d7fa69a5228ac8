"""On-device photometric augmentation.

The reference's color jitter runs per image on the host inside the mapper
(fork ``projects/CenterNet/.../dataset_mapper`` color_aug; upstream
``augmentation_impl.py:420-515``): four full-image float passes that cost
~5 ms/image on a 1-core host — more than the TPU spends on the whole train
step per image.  Elementwise work is effectively free on the TPU, so the
same jitter runs inside the jitted train step, vectorized over the batch
with per-image draws from the step rng.  The host then ships uint8 pixels
(4x fewer bytes) and skips the float passes entirely.

Documented deviation (PARITY.md): the contrast/saturation means are
computed over the *warped* 512^2 crop instead of the original image (the
device only sees the warped batch).  The jitter intensities are random to
begin with; the distribution shift is negligible.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["device_color_jitter"]

_EIGVAL = jnp.asarray([0.2141788, 0.01817699, 0.00341571], jnp.float32)
_EIGVEC = jnp.asarray(
    [
        [-0.58752847, -0.69563484, 0.41340352],
        [-0.5832747, 0.00994535, -0.81221408],
        [-0.56089297, 0.71832671, 0.41158938],
    ],
    jnp.float32,
)
_GRAY = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def device_color_jitter(
    images: jnp.ndarray,  # (N, H, W, 3) float32 0..255
    rng: jax.Array,
    prob: float = 0.4,
    contrast: Tuple[float, float] = (0.8, 1.2),
    brightness: Tuple[float, float] = (0.8, 1.2),
    saturation: Tuple[float, float] = (0.8, 1.2),
    lighting_scale: float = 0.1,
) -> jnp.ndarray:
    """Batched equivalent of ``data.transforms.PhotometricAug``."""
    n = images.shape[0]
    x = images.astype(jnp.float32)
    ks = jax.random.split(rng, 8)

    def draws(k, lo, hi):
        return jax.random.uniform(k, (n, 1, 1, 1), minval=lo, maxval=hi)

    def gates(k):
        return (jax.random.uniform(k, (n, 1, 1, 1)) < prob).astype(jnp.float32)

    # contrast: blend with the per-image mean
    w = 1.0 + gates(ks[0]) * (draws(ks[1], *contrast) - 1.0)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    x = mean * (1.0 - w) + x * w
    # brightness
    w = 1.0 + gates(ks[2]) * (draws(ks[3], *brightness) - 1.0)
    x = x * w
    # saturation: blend with the grayscale image
    w = 1.0 + gates(ks[4]) * (draws(ks[5], *saturation) - 1.0)
    gray = jnp.einsum("nhwc,c->nhw", x, _GRAY)[..., None]
    x = gray * (1.0 - w) + x * w
    # PCA lighting
    alpha = (
        jax.random.normal(ks[6], (n, 3)) * lighting_scale * gates(ks[7])[:, 0, 0, :]
    )
    shift = jnp.einsum("ck,nk->nc", _EIGVEC, alpha * _EIGVAL[None]) * 255.0
    return x + shift[:, None, None, :]
