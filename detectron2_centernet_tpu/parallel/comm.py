"""Host-side distributed helpers.

API surface of the reference's ``detectron2/utils/comm.py`` (:21-263) mapped
onto ``jax.distributed``: "rank" = JAX process index, "world size" = process
count.  Inside jitted code, communication is XLA collectives — these helpers
cover the *host-side* needs only: evaluator result gathering
(coco_evaluation.py:133-137), shared seeds (comm.py:220-231), and
main-process gating for checkpoint/log writers.

Every helper short-circuits at world size 1 exactly like the reference
(comm.py:139-151), so single-host runs never touch the distributed runtime.
"""

import pickle
from typing import Any, List, Optional

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    # One JAX process drives all local devices; the local rank concept from
    # one-process-per-GPU collapses to 0.
    return 0


def get_local_size() -> int:
    return 1


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (reference comm.py:67-80)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("d2tpu_sync")


def _object_to_array(data: Any) -> np.ndarray:
    buf = pickle.dumps(data)
    return np.frombuffer(buf, dtype=np.uint8)


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from every process (comm.py:139-175).

    Implemented with ``multihost_utils.process_allgather`` over padded byte
    buffers — the TPU-native replacement for the reference's gloo side group.
    """
    if get_world_size() == 1:
        return [data]
    from jax.experimental import multihost_utils

    local = _object_to_array(data)
    sizes = multihost_utils.process_allgather(np.asarray([local.size], np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: local.size] = local
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes())
        for i in range(get_world_size())
    ]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather to one rank (comm.py:177-219). On non-dst ranks returns [].

    jax's process_allgather is symmetric, so this is all_gather + filtering —
    same observable contract as the reference.
    """
    if get_world_size() == 1:
        return [data]
    result = all_gather(data)
    return result if get_rank() == dst else []


def shared_random_seed() -> int:
    """A seed shared by all processes (reference comm.py:220-231)."""
    seed = np.random.randint(2 ** 31)
    return int(all_gather(seed)[0])


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Mean/sum-reduce scalar dict values across processes (comm.py:234-263)."""
    if get_world_size() == 1:
        return input_dict
    keys = sorted(input_dict)
    values = np.asarray([float(input_dict[k]) for k in keys], np.float64)
    from jax.experimental import multihost_utils

    stacked = multihost_utils.process_allgather(values)
    red = stacked.mean(0) if average else stacked.sum(0)
    return {k: red[i] for i, k in enumerate(keys)}
