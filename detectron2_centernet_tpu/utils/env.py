"""Environment / seeding helpers (reference ``detectron2/utils/env.py:21-39``)."""

import datetime
import logging
import os
import random
from typing import Optional

import numpy as np

__all__ = ["seed_all_rng"]


def seed_all_rng(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs (JAX keys are explicit; trainers derive them
    from cfg.SEED). Returns the seed used."""
    if seed is None:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
        logging.getLogger(__name__).info("Using a generated random seed %d", seed)
    np.random.seed(seed % (2 ** 31))
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed
