"""Static-shape image batching.

Replaces the reference's ``ImageList.from_tensors`` (structures/image_list.py:
58-130), which pads each batch to the max size present — producing a different
shape per batch and therefore an XLA recompile per batch.  Here every batch is
padded/warped to a *fixed* (H, W) chosen from the config, and the per-image
true sizes plus the affine mapping back to original coordinates are carried on
the host.
"""

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import numpy as np


def pad_to_divisibility(size: Tuple[int, int], divisibility: int) -> Tuple[int, int]:
    """Round (h, w) up to the nearest multiple of ``divisibility``."""
    h, w = size
    if divisibility > 1:
        h = (h + divisibility - 1) // divisibility * divisibility
        w = (w + divisibility - 1) // divisibility * divisibility
    return h, w


@dataclass
class ImageBatch:
    """A batch of images in one NHWC array with per-image metadata.

    Attributes:
      tensor: ``(N, H, W, 3)`` float array, fixed H/W per config.
      image_sizes: per-image valid (h, w) inside the padded canvas — the
        analog of ``ImageList.image_sizes``.
      orig_sizes: per-image original (h, w) before resize (for
        ``detector_postprocess`` un-mapping).
      warps: per-image 2x3 affine matrices mapping *original* image coords to
        network-input coords; invert to map detections back.
    """

    tensor: np.ndarray
    image_sizes: List[Tuple[int, int]]
    orig_sizes: List[Tuple[int, int]] = field(default_factory=list)
    warps: List[np.ndarray] = field(default_factory=list)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @staticmethod
    def from_arrays(
        images: Sequence[np.ndarray],
        target_size: Tuple[int, int],
        pad_value: float = 0.0,
    ) -> "ImageBatch":
        """Top-left pad HWC images into a common fixed canvas.

        Images larger than ``target_size`` are an error — resizing belongs to
        the transform pipeline, not the batcher.
        """
        h, w = target_size
        n = len(images)
        c = images[0].shape[-1]
        out = np.full((n, h, w, c), pad_value, dtype=np.float32)
        sizes = []
        for i, im in enumerate(images):
            ih, iw = im.shape[:2]
            assert ih <= h and iw <= w, f"image {im.shape} exceeds canvas {target_size}"
            out[i, :ih, :iw] = im
            sizes.append((ih, iw))
        return ImageBatch(tensor=out, image_sizes=sizes)


# Reference-name alias: code written against detectron2's ``ImageList`` can
# keep the name; the static-shape semantics are documented above.
ImageList = ImageBatch
