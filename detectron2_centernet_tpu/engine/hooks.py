"""Standard training hooks (reference ``detectron2/engine/hooks.py``).

``CallbackHook`` (:40), ``IterationTimer`` (:75), ``PeriodicWriter`` (:146),
``PeriodicCheckpointer`` (:177), ``LRScheduler`` (:196), ``EvalHook`` (:300),
``PreciseBN`` (:357) and the profiler hook (:236) re-based on JAX:

  * LR is computed by the schedule function inside the jitted optimizer, so
    the ``LRScheduler`` hook only *records* lr into EventStorage;
  * the profiler hook wraps chosen iterations in ``jax.profiler`` traces
    (chrome-trace output like the reference's autograd profiler).
"""

import logging
import tempfile
import time
from typing import Callable, Optional

import numpy as np

from ..utils.events import get_event_storage
from .train_loop import HookBase

logger = logging.getLogger(__name__)

__all__ = [
    "CallbackHook",
    "IterationTimer",
    "PeriodicWriter",
    "PeriodicCheckpointerHook",
    "LRSchedulerHook",
    "JaxProfiler",
    "EvalHook",
    "PreciseBN",
]


class CallbackHook(HookBase):
    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._after_train = after_train
        self._before_step = before_step
        self._after_step = after_step

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)
        self._before_train = self._after_train = None
        self._before_step = self._after_step = None

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Per-iteration wall time excluding warmup and hook overhead
    (reference hooks.py:75-143)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._total_timer_paused = 0.0
        self._step_start = None

    def before_train(self):
        self._start_time = time.perf_counter()

    def after_train(self):
        total_time = time.perf_counter() - self._start_time
        num_iter = self.trainer.iter + 1 - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0:
            storage = self.trainer.storage
            try:
                hist = storage.history("time")
                logger.info(
                    "Total training time: %.4f s (%.4f s / it avg)",
                    total_time,
                    hist.global_avg(),
                )
            except KeyError:
                pass

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        iter_done = self.trainer.iter - self.trainer.start_iter + 1
        if iter_done > self._warmup_iter and self._step_start is not None:
            get_event_storage().put_scalar(
                "time", time.perf_counter() - self._step_start
            )


class PeriodicWriter(HookBase):
    """Flush writers every ``period`` iterations + at train end
    (reference hooks.py:146-174)."""

    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            if hasattr(self.trainer, "_flush_metrics"):
                self.trainer._flush_metrics()
            for writer in self._writers:
                writer.write()

    def after_train(self):
        for writer in self._writers:
            writer.write()
            writer.close()


class PeriodicCheckpointerHook(HookBase):
    """Drives checkpoint.PeriodicCheckpointer from the loop."""

    def __init__(self, periodic_checkpointer):
        self._pc = periodic_checkpointer

    def before_train(self):
        self._pc.max_iter = self.trainer.max_iter

    def after_step(self):
        self._pc.step(self.trainer.iter, state=getattr(self.trainer, "state", None))


class LRSchedulerHook(HookBase):
    """Record the schedule's lr into EventStorage (reference hooks.py:196-233;
    the schedule itself lives inside the jitted optimizer)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        lr = float(np.asarray(self._schedule(self.trainer.iter)))
        get_event_storage().put_scalar("lr", lr, smoothing_hint=False)


class JaxProfiler(HookBase):
    """Trace chosen iterations with jax.profiler (reference AutogradProfiler,
    hooks.py:236-298, which dumps chrome traces)."""

    def __init__(self, enable_predicate: Callable[["HookBase"], bool], output_dir: Optional[str] = None):
        self._enable_predicate = enable_predicate
        self._output_dir = output_dir or tempfile.mkdtemp(prefix="d2tpu_profile_")
        self._active = False

    def before_step(self):
        if self._enable_predicate(self.trainer):
            import jax

            jax.profiler.start_trace(self._output_dir)
            self._active = True

    def after_step(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info("Profiler trace saved to %s", self._output_dir)


class EvalHook(HookBase):
    """Run ``eval_function`` every ``eval_period`` and at train end
    (reference hooks.py:300-355); results go to EventStorage."""

    def __init__(self, eval_period: int, eval_function: Callable):
        self._period = eval_period
        self._func = eval_function

    def _do_eval(self):
        results = self._func()
        if results:
            assert isinstance(results, dict), (
                f"Eval function must return a dict. Got {results} instead."
            )
            from ..evaluation.testing import flatten_results_dict

            flat = flatten_results_dict(results)
            storage = get_event_storage()
            for k, v in flat.items():
                try:
                    storage.put_scalar(k, float(v), smoothing_hint=False)
                except (ValueError, TypeError) as e:
                    raise ValueError(
                        f"[EvalHook] eval_function should return a nested dict of "
                        f"float. Got '{k}: {v}' instead."
                    ) from e

    def after_step(self):
        next_iter = self.trainer.iter + 1
        if self._period > 0 and next_iter % self._period == 0:
            if next_iter != self.trainer.max_iter:
                self._do_eval()

    def after_train(self):
        if self.trainer.iter + 1 >= self.trainer.max_iter:
            self._do_eval()
        del self._func


class PreciseBN(HookBase):
    """Recompute BatchNorm statistics as a true average over ``num_iter``
    train batches before evaluation (reference hooks.py:357-418 /
    fvcore update_bn_stats).  Works on any trainer exposing ``state`` with
    ``batch_stats`` and a meta-arch ``model`` whose flax module mutates
    'batch_stats' when applied with train=True."""

    def __init__(self, period: int, data_loader, num_iter: int = 200):
        self._period = period
        self._data_loader = data_loader
        self._num_iter = num_iter
        self._data_iter = None

    def _update_stats(self):
        import jax
        import numpy as np

        trainer = self.trainer
        model = trainer.model
        state = trainer.state
        if not state.batch_stats:
            return
        if self._data_iter is None:
            self._data_iter = iter(self._data_loader)

        import jax.numpy as jnp

        def forward_stats(params, stats, images):
            _, mutated = model.module.apply(
                {"params": params, "batch_stats": stats},
                model.normalize(images), train=True, mutable=["batch_stats"],
            )
            return mutated["batch_stats"]

        from ..models.layers import BN_MOMENTUM

        fwd = jax.jit(forward_stats)
        running = None
        n = 0
        for _ in range(self._num_iter):
            batch = next(self._data_iter)
            new_stats = fwd(state.params, state.batch_stats, jnp.asarray(batch["image"]))
            # every BN applies new = m*base + (1-m)*batch with the SAME
            # fixed base (state.batch_stats), so the batch statistics are
            # recovered exactly; averaging those is fvcore
            # update_bn_stats' momentum=1.0 plain average (reference
            # hooks.py:357-418)
            batch_stats = jax.tree_util.tree_map(
                lambda new, base: (new - BN_MOMENTUM * base) / (1.0 - BN_MOMENTUM),
                new_stats,
                state.batch_stats,
            )
            running = (
                batch_stats
                if running is None
                else jax.tree_util.tree_map(lambda a, b: a + b, running, batch_stats)
            )
            n += 1
        avg = jax.tree_util.tree_map(lambda x: x / n, running)
        trainer.state = state.replace(batch_stats=avg)
        logger.info("PreciseBN updated batch statistics over %d iters", n)

    def after_step(self):
        # like EvalHook: fires on the period AND at the final iteration even
        # with period 0, so stats are precise for the end-of-training eval
        next_iter = self.trainer.iter + 1
        if (
            self._period > 0 and next_iter % self._period == 0
        ) or next_iter == self.trainer.max_iter:
            self._update_stats()
