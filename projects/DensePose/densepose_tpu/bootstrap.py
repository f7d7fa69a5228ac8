"""DensePose bootstrapping pipeline: train on a teacher's predictions.

Counterpart of the reference's sampler/loader stack
(``densepose/data/samplers/densepose_base.py:18-120``,
``densepose_uniform.py``, ``densepose_confidence_based.py``,
``inference_based_loader.py:33-146``, ``video/video_keyframe_dataset.py``,
``build.py``'s combined loaders): unlabeled images flow through a frozen
teacher, its chart predictions are subsampled into pseudo ground-truth
IUV points, and the result feeds the normal train step.

TPU redesign: samplers emit the framework's fixed-capacity dense-target
arrays (``gt_dp_x .. gt_dp_valid`` of shape ``(MAX_OBJS, MAX_DP_POINTS)``)
directly — there is no ragged DensePoseList intermediary — so a bootstrap
batch is shape-identical to a labeled batch and the jitted SPMD train step
recompiles nothing.  The teacher runs through the same jitted
``predict_fn`` used for evaluation.
"""

import random
from enum import Enum
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

__all__ = [
    "ScoreBasedFilter",
    "DensePoseUniformSampler",
    "DensePoseConfidenceBasedSampler",
    "MaskFromDensePoseSampler",
    "InferenceBasedLoader",
    "FrameSelectionStrategy",
    "build_frame_selector",
    "RandomKFramesSelector",
    "FirstKFramesSelector",
    "LastKFramesSelector",
    "VideoKeyframeDataset",
    "ImageResizeTransform",
    "ImageListDataset",
    "CombinedDataLoader",
]

N_PART_LABELS = 24


class ScoreBasedFilter:
    """Keep only detections above ``min_score`` (reference
    inference_based_loader.py:33-49)."""

    def __init__(self, min_score: float = 0.8):
        self.min_score = min_score

    def __call__(self, pred: Dict[str, np.ndarray]) -> np.ndarray:
        """-> bool keep mask over the detection axis."""
        return np.asarray(pred["scores"]) >= self.min_score


class DensePoseBaseSampler:
    """Predicted IUV rasters -> packed pseudo-annotation point arrays.

    Per detection, for each of the 24 chart parts present in the predicted
    label raster, draw up to ``count_per_class`` texels (strategy defined by
    ``_produce_index_sample``) and record their 256-normalized box coords,
    part id, and predicted U/V (reference densepose_base.py:56-120)."""

    def __init__(self, count_per_class: int = 8):
        self.count_per_class = count_per_class

    def _confidence(self, pred, det: int) -> Optional[np.ndarray]:
        return None

    def _produce_index_sample(self, conf: Optional[np.ndarray], count: int,
                              k: int) -> Sequence[int]:
        raise NotImplementedError

    def __call__(self, pred: Dict[str, np.ndarray], max_objs: int,
                 max_points: int) -> Dict[str, np.ndarray]:
        labels = np.asarray(pred["dp_labels"])  # (K, S, S)
        u, v = np.asarray(pred["dp_u"]), np.asarray(pred["dp_v"])
        n_det = min(labels.shape[0], max_objs)
        s = labels.shape[-1]
        out = {
            "gt_dp_x": np.zeros((max_objs, max_points), np.float32),
            "gt_dp_y": np.zeros((max_objs, max_points), np.float32),
            "gt_dp_I": np.zeros((max_objs, max_points), np.int32),
            "gt_dp_U": np.zeros((max_objs, max_points), np.float32),
            "gt_dp_V": np.zeros((max_objs, max_points), np.float32),
            "gt_dp_valid": np.zeros((max_objs, max_points), np.float32),
        }
        for i in range(n_det):
            xs_all, ys_all, is_all, us_all, vs_all = [], [], [], [], []
            conf = self._confidence(pred, i)
            for part in range(1, N_PART_LABELS + 1):
                yy, xx = np.nonzero(labels[i] == part)
                k = len(yy)
                if k == 0:
                    continue
                count = min(self.count_per_class, k)
                cvals = conf[yy, xx] if conf is not None else None
                sel = np.asarray(
                    self._produce_index_sample(cvals, count, k), np.int64
                )
                # texel centers -> the reference's 256-normalized box frame
                xs_all.append((xx[sel] + 0.5) / s * 256.0)
                ys_all.append((yy[sel] + 0.5) / s * 256.0)
                is_all.append(np.full(count, part, np.int32))
                us_all.append(u[i][yy[sel], xx[sel]])
                vs_all.append(v[i][yy[sel], xx[sel]])
            if not xs_all:
                continue
            xs = np.concatenate(xs_all)[:max_points]
            p = len(xs)
            out["gt_dp_x"][i, :p] = xs
            out["gt_dp_y"][i, :p] = np.concatenate(ys_all)[:max_points]
            out["gt_dp_I"][i, :p] = np.concatenate(is_all)[:max_points]
            out["gt_dp_U"][i, :p] = np.concatenate(us_all)[:max_points]
            out["gt_dp_V"][i, :p] = np.concatenate(vs_all)[:max_points]
            out["gt_dp_valid"][i, :p] = 1.0
        return out


class DensePoseUniformSampler(DensePoseBaseSampler):
    """Uniform over each part's texels (reference densepose_uniform.py)."""

    def _produce_index_sample(self, conf, count, k):
        return random.sample(range(k), count)


class DensePoseConfidenceBasedSampler(DensePoseBaseSampler):
    """Prefer low-sigma texels: restrict to the most confident
    ``search_count_multiplier * count`` (or ``search_proportion * k``)
    candidates, then sample uniformly among them (reference
    densepose_confidence_based.py:10-103).  ``confidence_channel`` names a
    per-texel raster on the prediction dict (``dp_sigma_2``)."""

    def __init__(self, confidence_channel: str = "dp_sigma_2",
                 count_per_class: int = 8,
                 search_count_multiplier: Optional[float] = None,
                 search_proportion: Optional[float] = None):
        super().__init__(count_per_class)
        assert search_count_multiplier is None or search_proportion is None
        self.confidence_channel = confidence_channel
        self.search_count_multiplier = search_count_multiplier
        self.search_proportion = search_proportion

    def _confidence(self, pred, det):
        return np.asarray(pred[self.confidence_channel][det])

    def _produce_index_sample(self, conf, count, k):
        if k == count:
            return list(range(k))
        if self.search_count_multiplier is not None:
            search = min(int(count * self.search_count_multiplier), k)
        elif self.search_proportion is not None:
            search = min(max(int(k * self.search_proportion), count), k)
        else:
            search = min(count, k)
        # lowest sigma^2 = most confident
        best = np.argsort(conf)[:search]
        return best[random.sample(range(search), count)]


class MaskFromDensePoseSampler:
    """Predicted coarse-fg rasters -> instance bitmasks
    (reference samplers/mask_from_densepose.py): the DensePose label raster's
    foreground is the pseudo ground-truth mask."""

    def __init__(self, raster: int = 64):
        self.raster = raster

    def __call__(self, pred: Dict[str, np.ndarray], max_objs: int) -> np.ndarray:
        labels = np.asarray(pred["dp_labels"])  # (K, S, S)
        n = min(labels.shape[0], max_objs)
        s = labels.shape[-1]
        out = np.zeros((max_objs, self.raster, self.raster), np.uint8)
        if s >= self.raster and s % self.raster == 0:
            step = s // self.raster
            for i in range(n):
                fg = labels[i] > 0
                out[i] = (
                    fg.reshape(self.raster, step, self.raster, step)
                    .max(axis=(1, 3))
                    .astype(np.uint8)
                )
        else:
            # Non-multiple (e.g. HEATMAP_SIZE=112 with raster=64) or
            # upsampling rasters: area-resize the fg fraction and keep any
            # cell with foreground coverage, matching the block-max intent.
            import cv2

            for i in range(n):
                fg = (labels[i] > 0).astype(np.float32)
                resized = cv2.resize(
                    fg, (self.raster, self.raster),
                    interpolation=cv2.INTER_AREA,
                )
                out[i] = (resized > 0).astype(np.uint8)
        return out


class InferenceBasedLoader:
    """Iterator of train batches whose dense targets come from a teacher.

    ``predict`` is the jitted chart inference (image batch -> prediction
    dict with per-detection ``boxes/scores/dp_*``); ``image_loader`` yields
    ``(B, H, W, 3)`` float batches of unlabeled images.  Each output batch
    carries pseudo gt boxes/classes plus packed dp points (reference
    inference_based_loader.py:52-146)."""

    def __init__(self, predict: Callable, image_loader: Iterable,
                 data_sampler: DensePoseBaseSampler,
                 data_filter: Optional[ScoreBasedFilter] = None,
                 max_objs: int = 8, max_points: int = 196):
        self.predict = predict
        self.image_loader = image_loader
        self.data_sampler = data_sampler
        self.data_filter = data_filter or ScoreBasedFilter()
        self.max_objs = max_objs
        self.max_points = max_points

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for images in self.image_loader:
            images = np.asarray(images)
            preds = {k: np.asarray(v) for k, v in self.predict(images).items()}
            n = images.shape[0]
            m = self.max_objs
            batch: Dict[str, np.ndarray] = {
                "image": images.astype(np.float32),
                "gt_boxes": np.zeros((n, m, 4), np.float32),
                "gt_classes": np.zeros((n, m), np.int32),
                "gt_valid": np.zeros((n, m), bool),
            }
            dp = {
                k: []
                for k in ("gt_dp_x", "gt_dp_y", "gt_dp_I", "gt_dp_U",
                          "gt_dp_V", "gt_dp_valid")
            }
            for b in range(n):
                pred_b = {k: v[b] for k, v in preds.items()}
                keep = np.nonzero(self.data_filter(pred_b))[0][:m]
                pred_b = {k: v[keep] for k, v in pred_b.items()}
                nk = len(keep)
                batch["gt_boxes"][b, :nk] = pred_b["boxes"][:, :4]
                batch["gt_valid"][b, :nk] = True
                sampled = self.data_sampler(pred_b, m, self.max_points)
                for k in dp:
                    dp[k].append(sampled[k])
            for k in dp:
                batch[k] = np.stack(dp[k])
            yield batch


class FrameSelectionStrategy(Enum):
    """Video frame selection strategies (reference
    video/frame_selector.py:13-27)."""

    RANDOM_K = "random_k"
    FIRST_K = "first_k"
    LAST_K = "last_k"
    ALL = "all"


class RandomKFramesSelector:
    """Keep at most k frames, drawn uniformly without replacement
    (reference frame_selector.py:30-47)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_tss: List[int]) -> List[int]:
        return random.sample(frame_tss, min(self.k, len(frame_tss)))


class FirstKFramesSelector:
    """Keep at most the k first frames (reference frame_selector.py:50-65)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_tss: List[int]) -> List[int]:
        return frame_tss[: self.k]


class LastKFramesSelector:
    """Keep at most the k last frames (reference frame_selector.py:68-84)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, frame_tss: List[int]) -> List[int]:
        return frame_tss[-self.k :]


def build_frame_selector(strategy: FrameSelectionStrategy, k: int = 16):
    """Strategy enum -> selector callable (reference data/build.py's
    ``build_frame_selector``)."""
    return {
        FrameSelectionStrategy.RANDOM_K: lambda: RandomKFramesSelector(k),
        FrameSelectionStrategy.FIRST_K: lambda: FirstKFramesSelector(k),
        FrameSelectionStrategy.LAST_K: lambda: LastKFramesSelector(k),
        FrameSelectionStrategy.ALL: lambda: (lambda tss: tss),
    }[strategy]()


class ImageResizeTransform:
    """Frames (N, H, W, 3) RGB uint8 -> model-ready float32, aspect-
    preserving resize to respect (min_size, max_size) (reference
    data/transform/image.py).

    TPU deviation (documented): output stays NHWC + RGB — this framework's
    models consume NHWC and the mapper handles channel order — where the
    reference emits NCHW BGR for its torch models."""

    def __init__(self, min_size: int = 800, max_size: int = 1333):
        self.min_size = min_size
        self.max_size = max_size

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        import cv2

        frames = np.asarray(frames)
        h, w = frames.shape[1:3]
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        new_w, new_h = int(w * scale), int(h * scale)
        out = np.empty((frames.shape[0], new_h, new_w, 3), np.float32)
        for i, frame in enumerate(frames):
            out[i] = cv2.resize(
                frame.astype(np.float32), (new_w, new_h),
                interpolation=cv2.INTER_LINEAR,
            )
        return out


class ImageListDataset:
    """Images from a list of file paths; unreadable files yield the empty
    sentinel instead of raising (reference data/image_list_dataset.py)."""

    _EMPTY_IMAGE = np.empty((1, 1, 3), np.float32)

    def __init__(self, image_list: List[str], transform=None):
        self.image_list = list(image_list)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.image_list)

    def __getitem__(self, idx: int) -> np.ndarray:
        from detectron2_centernet_tpu.data.detection_utils import read_image

        fpath = self.image_list[idx]
        try:
            image = read_image(fpath, format="RGB")
            if self.transform is not None:
                image = self.transform(image[None])[0]  # transforms take batches
            return image
        except (OSError, RuntimeError) as e:
            import logging

            logging.getLogger(__name__).warning(
                "Error opening image file container %s: %s", fpath, e
            )
        return self._EMPTY_IMAGE


class VideoKeyframeDataset:
    """Keyframes of a list of videos as an image dataset (reference
    video/video_keyframe_dataset.py:24-232, frame-selector protocol).

    ``frame_selector`` maps the decoded frame-index list to the kept subset
    (reference FrameSelectionStrategy); decoding uses cv2 when available."""

    def __init__(self, video_list: List[str], frame_selector=None,
                 transform=None, max_frames: int = 16):
        self.video_list = video_list
        self.frame_selector = frame_selector or (lambda idx: idx[: max_frames])
        self.transform = transform
        self.max_frames = max_frames

    def __len__(self) -> int:
        return len(self.video_list)

    def __getitem__(self, idx: int) -> List[np.ndarray]:
        import cv2

        cap = cv2.VideoCapture(self.video_list[idx])
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        keep = set(self.frame_selector(list(range(n))))
        frames = []
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if i in keep:
                frames.append(frame[:, :, ::-1])  # BGR -> RGB
            i += 1
        cap.release()
        if self.transform is not None and frames:
            # Transforms take (N, H, W, 3) batches (ImageResizeTransform);
            # stack the keyframes and apply once.
            frames = list(self.transform(np.stack(frames)))
        return frames


class CombinedDataLoader:
    """Round-robin over several loaders with given ratios (reference
    build.py's ``CombinedDataLoader``): each pool draw picks loader ``i``
    with probability ``ratios[i]``; exhausted loaders restart."""

    def __init__(self, loaders: Sequence[Iterable], ratios: Sequence[float],
                 seed: int = 0):
        assert len(loaders) == len(ratios) and len(loaders) > 0
        self.loaders = list(loaders)
        total = float(sum(ratios))
        self.ratios = [r / total for r in ratios]
        self.seed = seed

    def __iter__(self):
        rng = random.Random(self.seed)
        its = [iter(ld) for ld in self.loaders]
        while True:
            i = rng.choices(range(len(its)), weights=self.ratios)[0]
            try:
                yield next(its[i])
            except StopIteration:
                its[i] = iter(self.loaders[i])
                yield next(its[i])
