"""Index samplers (reference ``detectron2/data/samplers/distributed_sampler.py``).

``TrainingSampler`` (:12-55): infinite shuffled index stream, sharded
``rank::world_size`` so each process sees a disjoint slice per epoch.
``RepeatFactorTrainingSampler`` (:57-170): LVIS-style category-rebalanced
stream.  ``InferenceSampler`` (:173-200): contiguous per-rank split.
Rank/world come from ``parallel.comm`` (JAX processes) instead of torch.
"""

import itertools
import math
from collections import defaultdict
from typing import Iterator, List, Optional

import numpy as np

from ..parallel import comm


class TrainingSampler:
    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None):
        self._size = size
        assert size > 0
        self._shuffle = shuffle
        self._seed = int(comm.shared_random_seed() if seed is None else seed)
        self._rank = comm.get_rank()
        self._world_size = comm.get_world_size()

    def __iter__(self) -> Iterator[int]:
        start = self._rank
        yield from itertools.islice(self._infinite_indices(), start, None, self._world_size)

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            if self._shuffle:
                yield from rng.permutation(self._size).tolist()
            else:
                yield from range(self._size)


class RepeatFactorTrainingSampler(TrainingSampler):
    """Repeat images containing rare categories (reference :57-170)."""

    def __init__(self, dataset_dicts: List[dict], repeat_thresh: float, shuffle: bool = True, seed: Optional[int] = None):
        category_freq: dict = defaultdict(int)
        for d in dataset_dicts:
            cats = {a["category_id"] for a in d.get("annotations", [])}
            for c in cats:
                category_freq[c] += 1
        num_images = len(dataset_dicts)
        for k in category_freq:
            category_freq[k] /= num_images
        category_rep = {
            c: max(1.0, math.sqrt(repeat_thresh / f)) for c, f in category_freq.items()
        }
        rep_factors = []
        for d in dataset_dicts:
            cats = {a["category_id"] for a in d.get("annotations", [])}
            rep_factors.append(max({category_rep[c] for c in cats}, default=1.0))
        self._int_part = np.trunc(rep_factors)
        self._frac_part = np.asarray(rep_factors) - self._int_part
        super().__init__(len(dataset_dicts), shuffle=shuffle, seed=seed)

    def _infinite_indices(self) -> Iterator[int]:
        rng = np.random.RandomState(self._seed)
        while True:
            rands = rng.rand(len(self._frac_part))
            rep = (self._int_part + (rands < self._frac_part)).astype(np.int64)
            indices = np.repeat(np.arange(len(rep)), rep)
            if self._shuffle:
                indices = rng.permutation(indices)
            yield from indices.tolist()


class InferenceSampler:
    """Contiguous per-rank split covering every index once (reference :173-200)."""

    def __init__(self, size: int):
        self._size = size
        rank = comm.get_rank()
        world = comm.get_world_size()
        shard_size = (size - 1) // world + 1
        begin = min(shard_size * rank, size)
        end = min(shard_size * (rank + 1), size)
        self._local_indices = range(begin, end)

    def __iter__(self) -> Iterator[int]:
        yield from self._local_indices

    def __len__(self) -> int:
        return len(self._local_indices)
