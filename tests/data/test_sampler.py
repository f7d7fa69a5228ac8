"""Sampler determinism / coverage (reference tests/data/test_sampler.py)."""

import itertools

from detectron2_centernet_tpu.data.samplers import InferenceSampler, TrainingSampler


def test_training_sampler_deterministic_and_covers():
    a = list(itertools.islice(iter(TrainingSampler(10, seed=3)), 30))
    b = list(itertools.islice(iter(TrainingSampler(10, seed=3)), 30))
    assert a == b
    assert set(a[:10]) == set(range(10))  # first epoch is a permutation


def test_training_sampler_no_shuffle():
    s = TrainingSampler(5, shuffle=False, seed=0)
    assert list(itertools.islice(iter(s), 10)) == list(range(5)) * 2


def test_inference_sampler_single_process():
    s = InferenceSampler(7)
    assert list(s) == list(range(7))
    assert len(s) == 7
