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

__all__ = ["device_color_jitter", "device_color_aug_ssd"]

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


# hue rotation in YIQ space (TF adjust_hue's linear approximation): a pure
# 3x3 matrix per angle — TPU-friendly, no HSV conversion
_RGB2YIQ = jnp.asarray(
    [[0.299, 0.587, 0.114],
     [0.596, -0.274, -0.322],
     [0.211, -0.523, 0.312]], jnp.float32
)
# exact inverse (the textbook constants are rounded to 3 decimals, which
# would leave a ~0.3/255 residual even at hue angle 0)
import numpy as _np

_YIQ2RGB = jnp.asarray(_np.linalg.inv(_np.asarray(_RGB2YIQ)), jnp.float32)


def device_color_aug_ssd(
    images: jnp.ndarray,  # (N, H, W, 3) float32 0..255, BGR (dataset order)
    rng: jax.Array,
    brightness_delta: float = 32.0,
    contrast: Tuple[float, float] = (0.5, 1.5),
    saturation: Tuple[float, float] = (0.5, 1.5),
    hue_delta_deg: float = 18.0,
) -> jnp.ndarray:
    """SSD photometric distortion (reference projects/PointRend/point_rend/
    color_augmentation.py:10-105), batched on device.

    Per image (each op independently gated at p=0.5, the SSD recipe):
    brightness shift +-32, contrast scale [0.5, 1.5], saturation scale
    [0.5, 1.5], hue rotation +-18 HSV degrees (= +-36 color-wheel degrees,
    applied as a YIQ-space rotation — the standard linear approximation of
    the HSV hue walk). The reference's random op ORDER (contrast before vs
    after saturation+hue) is a coin flip; both orders are linear ops at
    these magnitudes and commute to first approximation, so a fixed order
    is used. Clipping to [0, 255] happens after the brightness and contrast
    stages and once at the end, matching the reference's per-op clipping
    where it changes the distribution (brightness/contrast excursions must
    not feed unclipped values into the later stages). Known deviation:
    saturation is a luma gray-blend (cv2 convertScaleAbs-style) rather than
    an HSV S-channel scale — equivalent to first order, cheaper on VPU."""
    n = images.shape[0]
    x = images.astype(jnp.float32)
    ks = jax.random.split(rng, 8)

    def gate(k):
        return (jax.random.uniform(k, (n, 1, 1, 1)) < 0.5).astype(jnp.float32)

    # brightness: additive delta
    beta = jax.random.uniform(
        ks[0], (n, 1, 1, 1), minval=-brightness_delta, maxval=brightness_delta
    )
    x = jnp.clip(x + gate(ks[1]) * beta, 0.0, 255.0)
    # contrast: multiplicative
    alpha = jax.random.uniform(ks[2], (n, 1, 1, 1), minval=contrast[0], maxval=contrast[1])
    x = jnp.clip(x * (1.0 + gate(ks[3]) * (alpha - 1.0)), 0.0, 255.0)
    # saturation: blend with grayscale (the HSV S-scale equivalent)
    s = jax.random.uniform(ks[4], (n, 1, 1, 1), minval=saturation[0], maxval=saturation[1])
    w = 1.0 + gate(ks[5]) * (s - 1.0)
    gray = jnp.einsum("nhwc,c->nhw", x[..., ::-1], _GRAY)[..., None]  # BGR -> luma
    x = gray * (1.0 - w) + x * w
    # hue: YIQ rotation by theta (2x the HSV half-circle delta)
    theta = (
        jax.random.uniform(ks[6], (n,), minval=-hue_delta_deg, maxval=hue_delta_deg)
        * (2.0 * jnp.pi / 180.0)
        * gate(ks[7])[:, 0, 0, 0]
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    zero, one = jnp.zeros_like(cos), jnp.ones_like(cos)
    rot = jnp.stack(
        [jnp.stack([one, zero, zero], -1),
         jnp.stack([zero, cos, -sin], -1),
         jnp.stack([zero, sin, cos], -1)], 1
    )  # (N, 3, 3)
    m = jnp.einsum("ij,njk,kl->nil", _YIQ2RGB, rot, _RGB2YIQ)  # (N, 3, 3) rgb->rgb
    rgb = x[..., ::-1]
    rgb = jnp.einsum("nhwc,nkc->nhwk", rgb, m)
    x = rgb[..., ::-1]
    return jnp.clip(x, 0.0, 255.0)
