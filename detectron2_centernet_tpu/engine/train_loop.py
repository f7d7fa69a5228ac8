"""Training loop: hooks + trainer base + the SPMD SimpleTrainer.

Reference contract (``detectron2/engine/train_loop.py``): ``HookBase``'s
4-phase protocol (:26), ``TrainerBase.train`` driving
before_train / (before_step, run_step, after_step)* / after_train inside an
``EventStorage`` (:85-147), and ``SimpleTrainer.run_step`` (:212-251).

TPU redesign of the hot loop: ``run_step`` is ONE dispatch of the jitted
train step (engine/train_state.py) — forward, backward, gradient psum,
optimizer update all fused device-side.  Loss metrics come back as device
scalars; they are buffered and materialized in bulk every ``metrics_period``
iterations so the loop never blocks on a device→host sync per step (the
reference's per-step ``comm.gather`` of metrics, train_loop.py:273, is the
analog — and its NaN check ``_detect_anomaly`` :253-259 happens here at
flush time, raising ``FloatingPointError`` just like the reference).
"""

import logging
import time
import weakref
from typing import Dict, List, Optional

import numpy as np

from ..utils.events import EventStorage

logger = logging.getLogger(__name__)

__all__ = ["HookBase", "TrainerBase", "SimpleTrainer"]


class HookBase:
    """4-phase hook protocol (reference train_loop.py:26-83).

    ``self.trainer`` is set by ``TrainerBase.register_hooks``.
    """

    trainer: "TrainerBase"

    def before_train(self) -> None:
        pass

    def after_train(self) -> None:
        pass

    def before_step(self) -> None:
        pass

    def after_step(self) -> None:
        pass


class TrainerBase:
    def __init__(self) -> None:
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            # weakref back-pointer as in the reference (:109-116) to avoid
            # a hook<->trainer reference cycle
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int) -> None:
        logger.info("Starting training from iteration %d", start_iter)
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.before_step()
                    self.run_step()
                    self.after_step()
                # the reference sets iter = max_iter after a full run (:141-146)
                self.iter += 1
            except Exception:
                logger.exception("Exception during training:")
                raise
            finally:
                self.after_train()

    def before_train(self) -> None:
        for h in self._hooks:
            h.before_train()

    def after_train(self) -> None:
        if self.storage is not None:
            self.storage._iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self) -> None:
        if self.storage is not None:
            self.storage._iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_step(self) -> None:
        for h in self._hooks:
            h.after_step()

    def run_step(self) -> None:
        raise NotImplementedError


class SimpleTrainer(TrainerBase):
    """Single-model SPMD trainer.

    Parameters
    ----------
    model : a meta-arch object (exposes ``loss_fn``; see models/meta_arch)
    data_loader : iterator of host batches (dict of stacked numpy arrays)
    train_step : the jitted (state, device_batch) -> (state, metrics) fn
    state : the (replicated) TrainState
    shard_fn : host batch pytree -> device arrays with the right sharding
    """

    BATCH_KEYS = ("image", "gt_boxes", "gt_classes", "gt_valid", "gt_masks", "gt_keypoints", "sem_seg")

    def __init__(self, model, data_loader, train_step, state, shard_fn, metrics_period: int = 20) -> None:
        super().__init__()
        self.model = model
        self.data_loader = data_loader
        self._data_loader_iter = iter(data_loader)
        self.train_step = train_step
        self.state = state
        self.shard_fn = shard_fn
        self.metrics_period = max(1, metrics_period)
        self._pending: List[Dict] = []  # (iter, data_time, device metrics)

    def run_step(self) -> None:
        start = time.perf_counter()
        data = next(self._data_loader_iter)
        data_time = time.perf_counter() - start

        batch = {k: data[k] for k in self.BATCH_KEYS if k in data}
        batch = self.shard_fn(batch)
        self.state, metrics = self.train_step(self.state, batch)
        self._pending.append({"iter": self.iter, "data_time": data_time, "metrics": metrics})
        if len(self._pending) >= self.metrics_period or self.iter >= self.max_iter - 1:
            self._flush_metrics()

    def _flush_metrics(self) -> None:
        """Materialize buffered device metrics in one host sync."""
        if not self.pending_metrics():
            return
        storage = self.storage
        saved_iter = storage._iter if storage is not None else None
        for entry in self._pending:
            host = {k: float(np.asarray(v)) for k, v in entry["metrics"].items()}
            total = host.get("total_loss", sum(host.values()))
            if not np.isfinite(total):
                raise FloatingPointError(
                    f"Loss became infinite or NaN at iteration={entry['iter']}!\n"
                    f"loss_dict = {host}"
                )
            if storage is not None:
                storage._iter = entry["iter"]
                storage.put_scalar("data_time", entry["data_time"])
                for k, v in host.items():
                    storage.put_scalar(k, v)
        if storage is not None and saved_iter is not None:
            storage._iter = saved_iter
        self._pending = []

    def pending_metrics(self) -> List[Dict]:
        return self._pending

    def after_train(self) -> None:
        self._flush_metrics()
        super().after_train()
