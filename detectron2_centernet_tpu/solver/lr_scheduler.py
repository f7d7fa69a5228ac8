"""Learning-rate schedules.

Functional equivalents of the reference's ``detectron2/solver/lr_scheduler.py``
(``WarmupMultiStepLR`` :16, ``WarmupCosineLR`` :52, ``_get_warmup_factor_at_iter``
:87-113).  A schedule here is a pure ``step -> lr`` function (the optax
convention), which one jitted ``train_step`` can evaluate on device — no
stateful torch scheduler object to keep in sync with the optimizer.
"""

import math
from typing import Callable, Sequence

import jax.numpy as jnp


def _warmup_factor(step, method: str, warmup_iters: int, warmup_factor: float):
    """Reference ``_get_warmup_factor_at_iter`` (lr_scheduler.py:87-113)."""
    if warmup_iters <= 0:
        return jnp.ones_like(step, dtype=jnp.float32)
    if method == "constant":
        f = jnp.full_like(step, warmup_factor, dtype=jnp.float32)
    elif method == "linear":
        alpha = step.astype(jnp.float32) / warmup_iters
        f = warmup_factor * (1.0 - alpha) + alpha
    else:
        raise ValueError(f"Unknown warmup method: {method}")
    return jnp.where(step >= warmup_iters, 1.0, f)


def warmup_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable:
    """lr(step) = base_lr * warmup * gamma^(#milestones passed)."""
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step)
        w = _warmup_factor(step, warmup_method, warmup_iters, warmup_factor)
        n_passed = jnp.sum(step >= milestones)
        return base_lr * w * gamma ** n_passed.astype(jnp.float32)

    return schedule


def warmup_cosine_lr(
    base_lr: float,
    max_iters: int,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable:
    """lr(step) = base_lr * warmup * 0.5 * (1 + cos(pi * step / max_iters))."""

    def schedule(step):
        step = jnp.asarray(step)
        w = _warmup_factor(step, warmup_method, warmup_iters, warmup_factor)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * step.astype(jnp.float32) / max_iters))
        return base_lr * w * cos

    return schedule


def warmup_poly_lr(
    base_lr: float,
    max_iters: int,
    power: float = 0.9,
    constant_ending: float = 0.0,
    warmup_factor: float = 0.001,
    warmup_iters: int = 1000,
    warmup_method: str = "linear",
) -> Callable:
    """The DeepLab poly schedule (reference projects/DeepLab/deeplab/
    lr_scheduler.py:17-77): lr = base * warmup * (1 - step/max)^power, with
    an optional constant tail (factor clamped to ``constant_ending`` once
    the poly decay falls below it — used to stabilize the final iters)."""

    def schedule(step):
        step = jnp.asarray(step)
        w = _warmup_factor(step, warmup_method, warmup_iters, warmup_factor)
        poly = jnp.power(
            jnp.clip(1.0 - step.astype(jnp.float32) / max_iters, 0.0, 1.0),
            power,
        )
        if constant_ending > 0:
            # reference :66-70: constant tail after warmup
            poly = jnp.where(
                (w == 1.0) & (poly < constant_ending), constant_ending, poly
            )
        return base_lr * w * poly

    return schedule
