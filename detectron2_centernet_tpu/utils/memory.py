"""OOM resilience (reference ``detectron2/utils/memory.py:26-84``,
``retry_if_cuda_oom``).

JAX analog: device OOM surfaces as ``XlaRuntimeError: RESOURCE_EXHAUSTED``.
``retry_if_oom`` retries once after clearing jit caches, then falls back to
the CPU backend for that call.
"""

import functools
import logging
from typing import Callable

logger = logging.getLogger(__name__)

__all__ = ["retry_if_oom"]


def _is_oom(e: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e).lower()


def retry_if_oom(func: Callable) -> Callable:
    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return func(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — triage below
            if not _is_oom(e):
                raise
        logger.warning("OOM in %s; clearing caches and retrying", func.__name__)
        jax.clear_caches()
        try:
            return func(*args, **kwargs)
        except Exception as e:
            if not _is_oom(e):
                raise
        logger.warning("OOM again in %s; retrying on CPU", func.__name__)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            args = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, cpu) if hasattr(x, "shape") else x, args
            )
            return func(*args, **kwargs)

    return wrapped
