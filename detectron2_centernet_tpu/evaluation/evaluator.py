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

    start_data_time = time.perf_counter()
    for idx, batch in enumerate(iter(data_loader)):
        total_data_time += time.perf_counter() - start_data_time
        if idx == num_warmup:
            start_time = time.perf_counter()
            total_compute_time = 0.0
            total_eval_time = 0.0

        n_valid = batch["image"].shape[0]
        if batch_size is not None and n_valid < batch_size:
            batch = _pad_batch(batch, batch_size)

        start_compute_time = time.perf_counter()
        if "proposal_boxes" in batch:
            # precomputed-proposal workflow (MODEL.LOAD_PROPOSALS)
            dets = predict_fn(
                batch["image"], batch["proposal_boxes"], batch["proposal_valid"]
            )
        else:
            dets = predict_fn(batch["image"])
        dets = {k: np.asarray(v) for k, v in dets.items()}  # host fetch = fence
        total_compute_time += time.perf_counter() - start_compute_time

        start_eval_time = time.perf_counter()
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
        total_eval_time += time.perf_counter() - start_eval_time

        total += n_valid
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

    results = evaluator.evaluate()
    if results is None:
        results = {}
    return results
