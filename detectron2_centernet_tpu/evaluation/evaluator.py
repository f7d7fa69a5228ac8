"""Evaluator protocol + the timed inference loop.

Reference surface: ``DatasetEvaluator`` (evaluation/evaluator.py:13
reset/process/evaluate), ``DatasetEvaluators`` (:55), ``inference_on_dataset``
(:101-181) with its warmup-aware pure-compute vs wall-clock timing split.

TPU adaptation: the loop consumes *batched* fixed-shape inputs from
``build_detection_test_loader``, pads the final short batch up to the static
batch size (XLA compiles exactly one program), and fences timing with a host
fetch (``np.asarray``) — the ``torch.cuda.synchronize`` analog.
"""

import datetime
import logging
import time
from contextlib import ExitStack
from typing import Callable, Dict, List, Optional, Union

import numpy as np

from ..parallel import comm
from ..utils.logger import log_every_n_seconds

logger = logging.getLogger(__name__)

__all__ = ["DatasetEvaluator", "DatasetEvaluators", "inference_on_dataset"]

# timing of the most recent inference_on_dataset call (benchmark harnesses)
LAST_INFERENCE_STATS: dict = {}


class DatasetEvaluator:
    def reset(self) -> None:
        pass

    def process(self, inputs, outputs) -> None:
        pass

    def evaluate(self) -> Optional[Dict]:
        pass


class DatasetEvaluators(DatasetEvaluator):
    def __init__(self, evaluators: List[DatasetEvaluator]) -> None:
        super().__init__()
        self._evaluators = evaluators

    def reset(self) -> None:
        for evaluator in self._evaluators:
            evaluator.reset()

    def process(self, inputs, outputs) -> None:
        for evaluator in self._evaluators:
            evaluator.process(inputs, outputs)

    def evaluate(self) -> Dict:
        results = {}
        for evaluator in self._evaluators:
            result = evaluator.evaluate()
            if result is not None:
                for k, v in result.items():
                    assert k not in results, f"Different evaluators produce results with the same key {k}"
                    results[k] = v
        return results


def _pad_batch(batch: Dict[str, np.ndarray], size: int) -> Dict[str, np.ndarray]:
    n = batch["image"].shape[0]
    if n == size:
        return batch
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[-1:], size - n, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out


# batch keys the device program consumes (everything else stays host-side)
_DEVICE_KEYS = ("image", "proposal_boxes", "proposal_valid")


def _h2d_prefetch(data_loader, batch_size, stats=None):
    """Iterate (batch, device_arrays, n_valid) with host->device transfers
    running one batch ahead in a background thread.

    The H2D copy of a full eval batch can rival or exceed device compute
    (on this host's relayed TPU it is the single largest eval cost);
    overlapping it with the previous batch's compute + host postprocess
    pipelines all three stages.  ``stats`` (optional dict) accumulates the
    worker thread's own timing: ``loader_s`` (time blocked on the data
    loader = decode+warp+batching) and ``h2d_s`` (device_put + transfer
    fence) — on a single-core host these are CPU costs even though they
    "overlap" the main thread."""
    import queue as _queue
    import threading

    import jax

    q: "_queue.Queue" = _queue.Queue(maxsize=2)
    if stats is None:
        stats = {}
    stats.setdefault("loader_s", 0.0)
    stats.setdefault("h2d_s", 0.0)

    def worker():
        try:
            it = iter(data_loader)
            while True:
                t0 = time.perf_counter()
                try:
                    batch = next(it)
                except StopIteration:
                    break
                stats["loader_s"] += time.perf_counter() - t0
                n_valid = batch["image"].shape[0]
                if batch_size is not None and n_valid < batch_size:
                    batch = _pad_batch(batch, batch_size)
                t1 = time.perf_counter()
                dev = {k: jax.device_put(batch[k]) for k in _DEVICE_KEYS if k in batch}
                jax.block_until_ready(list(dev.values()))  # start the copy now
                stats["h2d_s"] += time.perf_counter() - t1
                q.put((batch, dev, n_valid))
        except Exception as e:  # surface loader/transfer errors
            q.put(e)
        finally:
            q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            return
        if isinstance(item, Exception):
            raise item
        yield item


def inference_on_dataset(
    predict_fn: Callable,
    data_loader,
    evaluator: Optional[Union[DatasetEvaluator, List[DatasetEvaluator]]],
    postprocess: Optional[Callable] = None,
    batch_size: Optional[int] = None,
) -> Dict:
    """Run ``predict_fn`` over every batch, feed evaluator, report timing.

    predict_fn(images (B,H,W,3) f32) -> dict of fixed-size device detections.
    postprocess(dets, warps, orig_sizes) -> list[{"instances": Instances}]
    (the meta-arch's host boundary).  The evaluator's ``process`` sees
    (inputs list[dict], outputs list[dict]) exactly like the reference.
    """
    if isinstance(evaluator, list):
        evaluator = DatasetEvaluators(evaluator)
    if evaluator is None:
        evaluator = DatasetEvaluators([])
    evaluator.reset()

    num_warmup = 5
    start_time = time.perf_counter()
    total_data_time = 0.0
    total_compute_time = 0.0
    total_eval_time = 0.0
    total = 0
    idx = -1

    def _finish(pending):
        """Fetch a dispatched batch's detections and run the host side.
        Returns (fetch_seconds, host_seconds)."""
        nonlocal total
        dets_dev, batch, n_valid = pending
        t0 = time.perf_counter()
        dets = {k: np.asarray(v) for k, v in dets_dev.items()}  # fence
        t1 = time.perf_counter()
        heights = np.asarray(batch["height"]).reshape(-1)
        widths = np.asarray(batch["width"]).reshape(-1)
        orig_sizes = [(int(h), int(w)) for h, w in zip(heights, widths)][:n_valid]
        warps = [np.asarray(w) for w in batch["warp"]][:n_valid]
        dets = {k: v[:n_valid] for k, v in dets.items()}
        if postprocess is not None:
            outputs = postprocess(dets, warps, orig_sizes)
        else:
            outputs = [
                {k: v[i] for k, v in dets.items()} for i in range(n_valid)
            ]
        inputs = [
            {
                "image_id": int(np.asarray(batch["image_id"]).reshape(-1)[i]),
                "height": orig_sizes[i][0],
                "width": orig_sizes[i][1],
            }
            for i in range(n_valid)
        ]
        evaluator.process(inputs, outputs)
        total += n_valid
        return t1 - t0, time.perf_counter() - t1

    # The loop is software-pipelined: batch k's predict is DISPATCHED (JAX
    # dispatch is async) before batch k-1's results are fetched and fed to
    # the evaluator, so device compute overlaps host postprocess/eval work
    # (and the loader's prefetch thread overlaps both).
    pending = None
    worker_stats: Dict[str, float] = {}
    start_data_time = time.perf_counter()
    for idx, (batch, dev, n_valid) in enumerate(
        _h2d_prefetch(data_loader, batch_size, worker_stats)
    ):
        total_data_time += time.perf_counter() - start_data_time
        if idx == num_warmup:
            # drain the last pre-warmup batch BEFORE resetting the timers so
            # its fetch/eval cost never leaks into the post-warmup totals
            if pending is not None:
                _finish(pending)
                pending = None
            start_time = time.perf_counter()
            total_compute_time = 0.0
            total_eval_time = 0.0

        start_compute_time = time.perf_counter()
        if "proposal_boxes" in dev:
            # precomputed-proposal workflow (MODEL.LOAD_PROPOSALS)
            dets_dev = predict_fn(
                dev["image"], dev["proposal_boxes"], dev["proposal_valid"]
            )
        else:
            dets_dev = predict_fn(dev["image"])
        total_compute_time += time.perf_counter() - start_compute_time

        if pending is not None:
            fetch_s, host_s = _finish(pending)
            total_compute_time += fetch_s
            total_eval_time += host_s
        pending = (dets_dev, batch, n_valid)

        iters_after_start = idx + 1 - num_warmup * int(idx >= num_warmup)
        if idx >= num_warmup and iters_after_start > 0:
            compute_per_img = total_compute_time / max(total, 1)
            log_every_n_seconds(
                logging.INFO,
                f"Inference done {idx + 1} batches. "
                f"Compute: {compute_per_img:.4f} s/img.",
                n=5,
            )
        start_data_time = time.perf_counter()

    if pending is not None:
        fetch_s, host_s = _finish(pending)
        total_compute_time += fetch_s
        total_eval_time += host_s

    total_time = time.perf_counter() - start_time
    num_images = max(total, 1)
    logger.info(
        "Total inference time: %s (%.6f s / img per device, on %d devices)",
        str(datetime.timedelta(seconds=total_time)),
        total_time / num_images,
        comm.get_world_size(),
    )
    logger.info(
        "Total inference pure compute time: %s (%.6f s / img per device)",
        str(datetime.timedelta(seconds=int(total_compute_time))),
        total_compute_time / num_images,
    )
    logger.info(
        "Inference breakdown: data %.4f s/img, compute %.4f s/img, "
        "eval %.4f s/img over %d images",
        total_data_time / num_images,
        total_compute_time / num_images,
        total_eval_time / num_images,
        num_images,
    )
    # machine-readable stats for benchmark harnesses (tools/benchmark.py,
    # bench.py): post-warmup wall covers images processed after the timer
    # reset at batch ``num_warmup`` (pipeline already full = sustained rate)
    warm_images = max(total - num_warmup * (batch_size or 1), 0)
    LAST_INFERENCE_STATS.clear()
    LAST_INFERENCE_STATS.update(
        total_images=total,
        data_s=total_data_time,
        compute_s=total_compute_time,
        eval_s=total_eval_time,
        loader_s=worker_stats.get("loader_s", 0.0),
        h2d_s=worker_stats.get("h2d_s", 0.0),
        warm_wall_s=total_time,
        warm_images=warm_images,
        sustained_img_s=(warm_images / total_time if total_time > 0 else 0.0),
    )

    results = evaluator.evaluate()
    if results is None:
        results = {}
    return results
