"""Train state + jitted train/predict step factories.

The reference's hot loop is ``SimpleTrainer.run_step`` (train_loop.py:212-251):
python calls model forward, autograd backward, DDP allreduce, optimizer step,
metric gather — five host round-trips per iteration.  Here the whole
iteration is ONE jitted function over a device mesh:

    state, metrics = train_step(state, batch)

with the batch sharded over the ``data`` mesh axis and the state replicated.
XLA's SPMD partitioner inserts the gradient all-reduce (the DDP equivalent)
and makes the BatchNorm batch-statistics global (the NaiveSyncBatchNorm
equivalent, reference layers/batch_norm.py:153-240) automatically.  Loss
NaN-guarding (reference ``_detect_anomaly``, train_loop.py:253-259) happens on
the host from the returned metrics, which are tiny scalars.
"""

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CfgNode
from ..solver import build_optimizer


@struct.dataclass
class TrainState:
    """Replicated training state: one pytree, checkpointable with orbax."""

    step: jnp.ndarray  # () int32
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict[str, Any], tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )


def create_train_state(cfg: CfgNode, meta_arch, rng: jax.Array) -> Tuple[TrainState, optax.GradientTransformation]:
    """Initialize model variables and optimizer state from a cfg."""
    size = tuple(cfg.INPUT.TRAIN_SIZE)
    variables = meta_arch.init(rng, size)
    tx = build_optimizer(cfg, variables["params"])
    return TrainState.create(variables, tx), tx


def make_train_step(
    meta_arch,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the single jitted SPMD training step.

    meta_arch must expose ``loss_fn(params, batch_stats, batch) ->
    (total, (loss_dict, new_batch_stats))`` — the contract every meta-arch in
    ``models/meta_arch`` implements.
    """

    def step_fn(state: TrainState, batch):
        # deterministic per-step rng for meta-archs that sample (RPN/ROI
        # subsampling); folded from the step counter so resume reproduces it
        batch = dict(batch)
        batch["rng"] = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        augment = getattr(meta_arch, "device_augment", None)
        if augment is not None:
            batch["image"] = augment(
                batch["image"].astype(jnp.float32),
                jax.random.fold_in(jax.random.PRNGKey(23), state.step),
            )

        def loss(params):
            return meta_arch.loss_fn(params, state.batch_stats, batch)

        (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(loss_dict)
        metrics["total_loss"] = total
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_predict_step(meta_arch, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Jitted batched inference: raw images -> fixed-size detections."""

    def step_fn(variables, images):
        return meta_arch.predict_fn(variables, images)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)
