"""Augmentation policies (host-side numpy).

Covers the reference's ``detectron2/data/transforms`` capability surface
(augmentation_impl.py:37-515) reorganized for the static-shape TPU pipeline:
geometric augmentation is ONE affine warp to the fixed network resolution
(random scale/shift crop + optional horizontal flip, composed into a single
2x3 matrix — the CenterNet recipe), and photometric augmentations are
elementwise numpy ops matching the fork's CenterNet mapper
(projects/CenterNet/center_net/dataset_mapper.py:33-46:
RandomContrast/RandomBrightness/RandomSaturation/RandomLighting under
RandomApply).  Composing geometry into one matrix keeps exactly one resample
per image regardless of how many augmentations are enabled.
"""

from typing import Optional, Tuple

import numpy as np

from .detection_utils import get_affine_transform


class PhotometricAug:
    """Contrast/brightness/saturation/lighting jitter.

    Intensity ranges mirror the reference's defaults
    (augmentation_impl.py:420-515; fork mapper :33-46): each sub-aug applied
    independently with probability ``prob``.
    """

    _EIGVAL = np.array([0.2141788, 0.01817699, 0.00341571], np.float32)
    _EIGVEC = np.array(
        [
            [-0.58752847, -0.69563484, 0.41340352],
            [-0.5832747, 0.00994535, -0.81221408],
            [-0.56089297, 0.71832671, 0.41158938],
        ],
        np.float32,
    )

    def __init__(
        self,
        prob: float = 0.4,
        contrast: Tuple[float, float] = (0.8, 1.2),
        brightness: Tuple[float, float] = (0.8, 1.2),
        saturation: Tuple[float, float] = (0.8, 1.2),
        lighting_scale: float = 0.1,
    ) -> None:
        self.prob = prob
        self.contrast = contrast
        self.brightness = brightness
        self.saturation = saturation
        self.lighting_scale = lighting_scale

    def __call__(self, image: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        """image: (H, W, 3) float32 (any channel order; lighting assumes RGB-ish)."""
        img = image.astype(np.float32)
        if rng.rand() < self.prob:  # contrast
            w = rng.uniform(*self.contrast)
            img = img.mean() * (1 - w) + img * w
        if rng.rand() < self.prob:  # brightness
            img = img * rng.uniform(*self.brightness)
        if rng.rand() < self.prob:  # saturation
            w = rng.uniform(*self.saturation)
            gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
            img = gray[:, :, None] * (1 - w) + img * w
        if rng.rand() < self.prob:  # PCA lighting
            weights = rng.normal(scale=self.lighting_scale, size=3).astype(np.float32)
            img = img + self._EIGVEC @ (weights * self._EIGVAL) * 255.0
        return img


class CenterAffineAug:
    """Train-time geometric augmentation as one affine matrix.

    Random scale in ``scale_range`` x the letterbox scale, random center
    shift up to ``shift_range`` of the image extent, optional horizontal
    flip — all composed into the source->network 2x3 matrix, so boxes and
    image share exactly the same mapping.
    """

    def __init__(
        self,
        out_size: Tuple[int, int],
        scale_range: Tuple[float, float] = (0.6, 1.4),
        shift_range: float = 0.1,
        flip_prob: float = 0.5,
    ) -> None:
        self.out_size = tuple(out_size)
        self.scale_range = scale_range
        self.shift_range = shift_range
        self.flip_prob = flip_prob

    def __call__(
        self, height: int, width: int, rng: Optional[np.random.RandomState]
    ) -> np.ndarray:
        center = np.array([width / 2.0, height / 2.0], np.float64)
        scale = float(max(height, width))
        if rng is not None:
            scale *= rng.uniform(*self.scale_range)
            center[0] += rng.uniform(-self.shift_range, self.shift_range) * width
            center[1] += rng.uniform(-self.shift_range, self.shift_range) * height
        m = get_affine_transform(center, scale, self.out_size)
        if rng is not None and rng.rand() < self.flip_prob:
            # flip x: x' = out_w - 1 - x  composed after the warp
            flip = np.array([[-1, 0, self.out_size[1] - 1], [0, 1, 0]], np.float64)
            m = np.concatenate([flip[:, :2] @ m[:, :2], (flip[:, :2] @ m[:, 2] + flip[:, 2])[:, None]], axis=1)
        return m


def letterbox_transform(height: int, width: int, out_size: Tuple[int, int]) -> np.ndarray:
    """Deterministic eval-time warp: centered, aspect-preserving
    (the ctdet test-time mapping; also the ``ResizeLetterBox`` analog,
    reference augmentation_impl.py:176-209)."""
    center = np.array([width / 2.0, height / 2.0], np.float64)
    return get_affine_transform(center, float(max(height, width)), out_size)
