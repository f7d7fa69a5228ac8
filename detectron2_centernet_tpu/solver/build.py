"""Optimizer construction (optax).

Capability match for the reference's ``detectron2/solver/build.py``:
``build_optimizer`` (:93-138) makes SGD+momentum with *per-parameter-group*
hyperparameters — norm-layer weight decay ``WEIGHT_DECAY_NORM``, bias decay
``WEIGHT_DECAY_BIAS`` and LR factor ``BIAS_LR_FACTOR`` — and
``maybe_add_gradient_clipping`` (:39-90) wraps it with value/norm clipping.

Here the groups are expressed as optax ``multi_transform`` partitions over the
params pytree, selected by parameter path: flax BatchNorm/GroupNorm parameters
live under a module named ``bn``/``norm``/``gn`` or are named ``scale``, and
biases are leaves named ``bias``.  The whole optimizer is a pure pytree
transformation usable inside one jitted train step.
"""

from typing import Any, Callable, Optional

import jax
import optax

from ..config import CfgNode
from .lr_scheduler import warmup_cosine_lr, warmup_multistep_lr, warmup_poly_lr

_NORM_MODULE_NAMES = ("bn", "norm", "gn", "batchnorm", "groupnorm")


def _param_group(path) -> str:
    """Classify a params-pytree leaf path into norm / bias / default."""
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    leaf = str(keys[-1]).lower() if keys else ""
    parents = [str(k).lower() for k in keys[:-1]]
    if leaf == "scale" or any(p in _NORM_MODULE_NAMES or p.endswith("_bn") for p in parents):
        # norm affine params (scale/bias under a norm module)
        return "norm"
    if leaf == "bias":
        return "bias"
    return "default"


def param_group_labels(params) -> Any:
    """Pytree of {'default','norm','bias'} labels matching ``params``."""
    return jax.tree_util.tree_map_with_path(lambda path, _: _param_group(path), params)


def build_lr_scheduler(cfg: CfgNode, name: Optional[str] = None) -> Callable:
    """step -> lr schedule (reference build.py:140-160)."""
    name = name or cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            gamma=cfg.SOLVER.GAMMA,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    if name == "WarmupPolyLR":
        # the DeepLab schedule (reference projects/DeepLab build_solver.py)
        return warmup_poly_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            power=cfg.SOLVER.POLY_LR_POWER,
            constant_ending=cfg.SOLVER.POLY_LR_CONSTANT_ENDING,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_method=cfg.SOLVER.WARMUP_METHOD,
        )
    raise ValueError(f"Unknown LR scheduler: {name}")


def _sgd_group(schedule: Callable, lr_factor: float, weight_decay: float, momentum: float, nesterov: bool):
    """One parameter group: decoupled-style WD added to the gradient (torch
    SGD semantics: g <- g + wd * p before the momentum update)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.sgd(
            learning_rate=lambda step: schedule(step) * lr_factor,
            momentum=momentum if momentum else None,
            nesterov=nesterov,
        ),
    )


def _adam_group(schedule: Callable, lr_factor: float, weight_decay: float):
    """One Adam parameter group (torch Adam semantics: L2 added to the
    gradient before the moment updates, like the upstream CenterNet recipe)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.adam(learning_rate=lambda step: schedule(step) * lr_factor),
    )


def build_optimizer(cfg: CfgNode, params) -> optax.GradientTransformation:
    """Per-group optimizer with reference WD/LR overrides + clipping.

    ``SOLVER.OPTIMIZER`` selects SGD+momentum (the reference
    ``build_optimizer``, solver/build.py:93-138) or Adam — the optimizer the
    upstream CenterNet training recipe uses for its focal-loss heads, which
    the reference fork approximates with very-low-LR SGD (its ctdet configs
    pin BASE_LR 2.5e-4 over 364k iters).

    ``params`` is the model params pytree (used only for group labeling).
    """
    s = cfg.SOLVER
    schedule = build_lr_scheduler(cfg)
    if s.OPTIMIZER.upper() == "ADAM":
        groups = {
            "default": _adam_group(schedule, 1.0, s.WEIGHT_DECAY),
            "norm": _adam_group(schedule, 1.0, s.WEIGHT_DECAY_NORM),
            "bias": _adam_group(schedule, s.BIAS_LR_FACTOR, s.WEIGHT_DECAY_BIAS),
        }
    else:
        groups = {
            "default": _sgd_group(schedule, 1.0, s.WEIGHT_DECAY, s.MOMENTUM, s.NESTEROV),
            "norm": _sgd_group(schedule, 1.0, s.WEIGHT_DECAY_NORM, s.MOMENTUM, s.NESTEROV),
            "bias": _sgd_group(
                schedule, s.BIAS_LR_FACTOR, s.WEIGHT_DECAY_BIAS, s.MOMENTUM, s.NESTEROV
            ),
        }
    tx = optax.multi_transform(groups, param_group_labels)

    clip = s.CLIP_GRADIENTS
    if clip.ENABLED:
        if clip.CLIP_TYPE == "value":
            clipper = optax.clip(clip.CLIP_VALUE)
        elif clip.CLIP_TYPE == "norm":
            clipper = optax.clip_by_global_norm(clip.CLIP_VALUE)
        else:
            raise ValueError(f"Unknown clip type: {clip.CLIP_TYPE}")
        tx = optax.chain(clipper, tx)
    return tx
