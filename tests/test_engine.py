"""Trainer loop / hooks behavior (reference tests/test_engine.py: SimpleTrainer
on a dummy model + dataset)."""

import numpy as np
import pytest

from detectron2_centernet_tpu.engine.train_loop import HookBase, SimpleTrainer, TrainerBase
from detectron2_centernet_tpu.engine import hooks as hk


class _DummyStep:
    """Stands in for the jitted train step."""

    def __init__(self, nan_at=None):
        self.calls = 0
        self.nan_at = nan_at

    def __call__(self, state, batch):
        self.calls += 1
        loss = np.float32("nan") if self.nan_at == self.calls - 1 else np.float32(1.0 / self.calls)
        return state + 1, {"total_loss": loss}


def _loader(n=1000):
    while True:
        yield {"image": np.zeros((2, 4, 4, 3), np.float32)}


def _make_trainer(nan_at=None, metrics_period=3):
    step = _DummyStep(nan_at=nan_at)
    return SimpleTrainer(None, _loader(), step, 0, lambda b: b, metrics_period=metrics_period), step


def test_simple_trainer_runs_and_buffers_metrics():
    trainer, step = _make_trainer()
    order = []

    class Recorder(HookBase):
        def before_step(self):
            order.append(("before", self.trainer.iter))

        def after_step(self):
            order.append(("after", self.trainer.iter))

    trainer.register_hooks([Recorder()])
    trainer.train(0, 7)
    assert step.calls == 7
    assert trainer.state == 7
    assert order[0] == ("before", 0) and order[-1] == ("after", 6)
    # all metrics flushed into storage by end of train
    assert not trainer.pending_metrics()


def test_nan_loss_raises():
    trainer, _ = _make_trainer(nan_at=4, metrics_period=2)
    with pytest.raises(FloatingPointError):
        trainer.train(0, 10)


def test_eval_hook_periods():
    trainer, _ = _make_trainer()
    results = []
    hook = hk.EvalHook(3, lambda: results.append(trainer.iter) or {"m": {"x": 1.0}})
    trainer.register_hooks([hook])
    trainer.train(0, 9)
    # fires after iters 2, 5 and at train end (where iter == max_iter)
    assert results == [2, 5, 9]


def test_periodic_writer_flush():
    trainer, _ = _make_trainer(metrics_period=100)

    class CountingWriter:
        def __init__(self):
            self.writes = 0

        def write(self):
            self.writes += 1

        def close(self):
            pass

    w = CountingWriter()
    trainer.register_hooks([hk.PeriodicWriter([w], period=4)])
    trainer.train(0, 8)
    assert w.writes == 2 + 1  # iters 3, 7 + final
