import numpy as np
import pytest

from detectron2_centernet_tpu.structures import ImageBatch, pad_to_divisibility


def test_pad_to_divisibility():
    assert pad_to_divisibility((100, 130), 32) == (128, 160)
    assert pad_to_divisibility((128, 128), 32) == (128, 128)
    assert pad_to_divisibility((5, 7), 1) == (5, 7)


def test_from_arrays_pads_topleft():
    imgs = [np.ones((4, 6, 3), np.float32), 2 * np.ones((8, 8, 3), np.float32)]
    batch = ImageBatch.from_arrays(imgs, target_size=(8, 8))
    assert batch.tensor.shape == (2, 8, 8, 3)
    assert batch.image_sizes == [(4, 6), (8, 8)]
    assert batch.tensor[0, :4, :6].min() == 1.0
    assert batch.tensor[0, 4:, :].max() == 0.0  # padding
    assert batch.tensor[1].min() == 2.0


def test_from_arrays_rejects_oversize():
    with pytest.raises(AssertionError):
        ImageBatch.from_arrays([np.zeros((10, 4, 3))], target_size=(8, 8))
