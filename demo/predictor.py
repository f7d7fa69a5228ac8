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
