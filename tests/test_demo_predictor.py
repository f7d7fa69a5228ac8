"""AsyncBatchPredictor pipeline semantics (reference demo/predictor.py
AsyncPredictor:135-223): ordering, partial-batch flush, generator draining.

The device side is stubbed — what's under test is the put/get pipeline
(threaded preprocess + async dispatch + ordered results), which is where
the reference's multiprocess pool logic lives.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demo"))


def _make(batch_size=4):
    from predictor import AsyncBatchPredictor, BatchPredictor

    inner = object.__new__(BatchPredictor)
    inner.batch_size = batch_size
    inner.size = (8, 8)
    inner.variables = None
    inner._letterbox = lambda h, w, size: np.eye(2, 3, dtype=np.float32)
    inner._warp = lambda im, m, size: im[: size[0], : size[1]]

    # fake jitted predict: echo each image's tag pixel so results are
    # attributable; "device" output is the batch of tags
    inner._predict = lambda variables, arr: {"tag": arr[:, 0, 0, 0].copy()}

    class _Model:
        @staticmethod
        def postprocess(dets, warps, sizes):
            return [{"tag": float(t)} for t in dets["tag"]]

    inner.model = _Model()

    pred = object.__new__(AsyncBatchPredictor)
    pred._inner = inner
    pred.batch_size = batch_size
    import queue
    import threading

    pred._frames = queue.Queue(maxsize=3 * batch_size)
    pred._results = queue.Queue(maxsize=2)
    pred._put_idx = 0
    pred._get_idx = 0
    pred._ready = []
    pred._worker = threading.Thread(target=pred._run_worker, daemon=True)
    pred._worker.start()
    return pred


def _frame(tag):
    im = np.zeros((8, 8, 3), np.float32)
    im[0, 0, 0] = tag
    return im


def test_put_get_preserves_order_across_batches():
    pred = _make(batch_size=4)
    for i in range(10):  # 2 full batches + partial
        pred.put(_frame(i))
    pred.flush()
    got = [pred.get()["tag"] for _ in range(10)]
    assert got == [float(i) for i in range(10)]
    assert len(pred) == 0
    pred.shutdown()


def test_generator_drains_iterator():
    pred = _make(batch_size=3)
    out = list(pred(_frame(i) for i in range(7)))
    assert [r["tag"] for r in out] == [float(i) for i in range(7)]
    pred.shutdown()


def test_partial_batch_flush_only_returns_valid():
    pred = _make(batch_size=4)
    pred.put(_frame(41.0))
    pred.flush()
    assert pred.get()["tag"] == 41.0
    assert len(pred) == 0
    pred.shutdown()
