"""Demo predictor helpers (reference ``demo/predictor.py``).

``VisualizationDemo`` runs a DefaultPredictor and draws results;
``BatchPredictor`` is the TPU-native replacement for ``AsyncPredictor``
(reference :135-223): instead of one process per GPU, a single process
batches frames into one jitted call — the idiomatic way to saturate a chip.
"""

import os
import sys
from typing import List

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detectron2_centernet_tpu.data import MetadataCatalog
from detectron2_centernet_tpu.engine import DefaultPredictor
from detectron2_centernet_tpu.utils.visualizer import (
    ColorMode,
    VideoVisualizer,
    Visualizer,
)


class VisualizationDemo:
    def __init__(self, cfg, instance_mode: int = ColorMode.IMAGE) -> None:
        self.metadata = MetadataCatalog.get(
            cfg.DATASETS.TEST[0] if len(cfg.DATASETS.TEST) else "__unused"
        )
        self.instance_mode = instance_mode
        self.predictor = DefaultPredictor(cfg)

    def run_on_image(self, image: np.ndarray):
        """image: (H, W, C) BGR uint8. Returns (predictions, VisImage)."""
        predictions = self.predictor(image)
        image_rgb = image[:, :, ::-1]
        visualizer = Visualizer(image_rgb, self.metadata, instance_mode=self.instance_mode)
        vis_output = None
        if "instances" in predictions:
            vis_output = visualizer.draw_instance_predictions(predictions["instances"])
        elif "panoptic_seg" in predictions:
            seg, info = predictions["panoptic_seg"]
            vis_output = visualizer.draw_panoptic_seg(np.asarray(seg), info)
        elif "sem_seg" in predictions:
            vis_output = visualizer.draw_sem_seg(predictions["sem_seg"])
        return predictions, vis_output

    def run_on_video(self, video_frames):
        """Frame generator -> (predictions, VisImage) generator with
        cross-frame color consistency (reference demo/predictor.py:52-100)."""
        video_vis = VideoVisualizer(self.metadata, self.instance_mode)
        for frame in video_frames:
            predictions = self.predictor(frame)
            rgb = frame[:, :, ::-1]
            if "instances" in predictions:
                vis = video_vis.draw_instance_predictions(
                    rgb, predictions["instances"]
                )
            elif "panoptic_seg" in predictions:
                seg, info = predictions["panoptic_seg"]
                vis = video_vis.draw_panoptic_seg_predictions(
                    rgb, np.asarray(seg), info
                )
            elif "sem_seg" in predictions:
                vis = video_vis.draw_sem_seg(rgb, predictions["sem_seg"])
            else:
                vis = None
            yield predictions, vis


class AsyncBatchPredictor:
    """Pipelined predictor (reference ``AsyncPredictor``, demo/predictor.py:
    135-223, re-designed for TPU).

    The reference hides per-frame GPU latency behind a pool of worker
    *processes* with task/result queues.  On TPU the same overlap falls out
    of two cheaper mechanisms: a host thread runs decode+warp preprocessing
    and *dispatches* the jitted call (JAX dispatch is asynchronous, so batch
    k+1 executes on device while the consumer fetches batch k), and ``get``
    blocks only on the device fetch of the oldest in-flight batch.
    ``put``/``get`` preserve submission order, like the reference's ordered
    result buffer (:186-199).
    """

    _STOP = object()

    def __init__(self, cfg, batch_size: int = 8, buffer_size: int = 3) -> None:
        import queue
        import threading

        self._inner = BatchPredictor(cfg, batch_size=batch_size)
        self.batch_size = batch_size
        self._frames = queue.Queue(maxsize=buffer_size * batch_size)
        # depth-2 in-flight pipeline: one batch on device, one fetched
        self._results = queue.Queue(maxsize=2)
        self._put_idx = 0
        self._get_idx = 0
        self._ready: list = []
        self._worker = threading.Thread(target=self._run_worker, daemon=True)
        self._worker.start()

    def _run_worker(self) -> None:
        import numpy as np

        inner = self._inner
        pending = []

        def flush():
            if not pending:
                return
            chunk, warps, sizes, batch = pending[:], [], [], []
            del pending[:]
            for im in chunk:
                h, w = im.shape[:2]
                m = inner._letterbox(h, w, inner.size)
                batch.append(inner._warp(im.astype(np.float32), m, inner.size))
                warps.append(m)
                sizes.append((h, w))
            arr = np.stack(batch)
            if len(chunk) < self.batch_size:
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], self.batch_size - len(chunk), 0)]
                )
            # non-blocking dispatch: device starts while we preprocess the
            # next batch; the queue (maxsize=2) applies backpressure
            dets = inner._predict(inner.variables, arr)
            self._results.put((dets, warps, sizes, len(chunk)))

        while True:
            frame = self._frames.get()
            if frame is self._STOP:
                flush()
                self._results.put(self._STOP)
                return
            if frame is None:  # explicit flush marker (end of stream)
                flush()
                continue
            pending.append(frame)
            if len(pending) == self.batch_size:
                flush()

    def put(self, image) -> None:
        """Submit one (H, W, C) BGR frame; returns immediately."""
        self._put_idx += 1
        self._frames.put(image)

    def flush(self) -> None:
        """Force the partially-filled batch through the pipeline."""
        self._frames.put(None)

    def get(self):
        """Next result dict, in submission order (blocks on device fetch)."""
        import numpy as np

        if not self._buffered():
            raise IndexError("get() called with no outstanding frames")
        if not getattr(self, "_ready", None):
            item = self._results.get()
            if item is self._STOP:
                raise IndexError("predictor was shut down")
            dets, warps, sizes, n = item
            dets = {k: np.asarray(v)[:n] for k, v in dets.items()}
            self._ready = list(self._inner.model.postprocess(dets, warps, sizes))
        self._get_idx += 1
        return self._ready.pop(0)

    def _buffered(self) -> bool:
        return self._get_idx < self._put_idx or bool(getattr(self, "_ready", None))

    def __len__(self) -> int:
        return self._put_idx - self._get_idx

    def __call__(self, frames):
        """Frame iterable -> ordered result generator, with
        ``default_buffer_size``-deep pipelining (reference :214-223)."""
        buffer_size = self.batch_size * 2
        frames = iter(frames)
        done = False
        while not done or len(self):
            while not done and len(self) < buffer_size:
                frame = next(frames, None)
                if frame is None:
                    done = True
                    self.flush()
                else:
                    self.put(frame)
            if len(self):
                yield self.get()

    def shutdown(self) -> None:
        self._frames.put(self._STOP)
        self._worker.join(timeout=30)


class BatchPredictor:
    """Batched throughput-mode predictor: accumulate frames, run one jitted
    call per batch (the TPU analog of the reference's AsyncPredictor pool)."""

    def __init__(self, cfg, batch_size: int = 8) -> None:
        import jax
        import jax.numpy as jnp

        from detectron2_centernet_tpu.data.detection_utils import warp_image
        from detectron2_centernet_tpu.data.transforms import letterbox_transform
        from detectron2_centernet_tpu.models import build_model
        from detectron2_centernet_tpu.checkpoint import DetectionCheckpointer

        self.cfg = cfg.clone()
        self.batch_size = batch_size
        self.model = build_model(self.cfg)
        self.size = tuple(cfg.INPUT.TEST_SIZE)
        variables = self.model.init(jax.random.PRNGKey(0), self.size)
        if cfg.MODEL.WEIGHTS:
            variables = DetectionCheckpointer(variables).load(cfg.MODEL.WEIGHTS)
        self.variables = variables
        self._predict = jax.jit(self.model.predict_fn)
        self._letterbox = letterbox_transform
        self._warp = warp_image

    def __call__(self, images: List[np.ndarray]):
        """List of (H, W, C) images -> list of {"instances": Instances}."""
        results = []
        for start in range(0, len(images), self.batch_size):
            chunk = images[start : start + self.batch_size]
            warps, sizes, batch = [], [], []
            for im in chunk:
                h, w = im.shape[:2]
                m = self._letterbox(h, w, self.size)
                batch.append(self._warp(im.astype(np.float32), m, self.size))
                warps.append(m)
                sizes.append((h, w))
            arr = np.stack(batch)
            if len(chunk) < self.batch_size:  # pad to the compiled shape
                pad = np.repeat(arr[-1:], self.batch_size - len(chunk), axis=0)
                arr = np.concatenate([arr, pad])
            dets = self._predict(self.variables, arr)
            dets = {k: np.asarray(v)[: len(chunk)] for k, v in dets.items()}
            results.extend(self.model.postprocess(dets, warps, sizes))
        return results
