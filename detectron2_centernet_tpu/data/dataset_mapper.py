"""DatasetMapper: dataset dict -> fixed-shape model-input arrays.

Redesign of the reference's ``DatasetMapper`` (dataset_mapper.py:20-185) and
the fork's ``TrafficLightDatasetMapper``
(projects/CenterNet/center_net/dataset_mapper.py:17-175) for static shapes:

  * TRAIN: read image -> photometric jitter -> ONE affine warp (random
    scale/shift/flip) to ``INPUT.TRAIN_SIZE`` -> boxes through the same
    matrix, clipped, filtered, padded to ``MAX_OBJS`` slots with a validity
    mask.  Gaussian heatmap targets are NOT rendered here — they are
    generated on-device inside the jitted train step (ops/target_gen.py).
  * EVAL: deterministic letterbox warp to ``INPUT.TEST_SIZE``; the matrix is
    returned so the model's ``postprocess`` can un-map boxes.

Output is a dict of numpy arrays with identical shapes for every image —
the property XLA needs to compile the step exactly once.
"""

import copy
from typing import Dict, Optional

import numpy as np

from ..config import CfgNode
from . import detection_utils as utils
from .transforms import (
    CenterAffineAug,
    PhotometricAug,
    RandomCropCategoryAreaConstraint,
    RandomExtentAug,
    RandomRotationAug,
    compose_affine,
    letterbox_transform,
    window_to_output_transform,
)

__all__ = ["DatasetMapper"]


class DatasetMapper:
    def __init__(self, cfg: CfgNode, is_train: bool = True) -> None:
        self.is_train = is_train
        self.image_format = cfg.INPUT.FORMAT
        if cfg.TEST.EXACT_MODE:
            # pixel-exact parity with PIL-decoded reference goldens
            # (cv2/libjpeg-turbo decode differs by +-1 LSB)
            utils.FORCE_PIL_DECODE = True
        self.mask_on = bool(cfg.MODEL.MASK_ON)
        self.keypoint_on = bool(cfg.MODEL.KEYPOINT_ON)
        self.num_keypoints = int(cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS)
        # flip index permutation from metadata when a train dataset is known
        self.kp_flip_indices = None
        if self.keypoint_on and len(cfg.DATASETS.TRAIN):
            from .catalog import MetadataCatalog

            meta = MetadataCatalog.get(cfg.DATASETS.TRAIN[0])
            names = meta.get("keypoint_names")
            flip_map = meta.get("keypoint_flip_map")
            if names and flip_map:
                idx = {n: i for i, n in enumerate(names)}
                perm = list(range(len(names)))
                for a, b in flip_map:
                    perm[idx[a]], perm[idx[b]] = idx[b], idx[a]
                self.kp_flip_indices = np.asarray(perm)
        self.mask_raster = int(cfg.INPUT.MASK_RASTER)
        self.max_objs = int(cfg.MODEL.CENTERNET.MAX_OBJS)
        # precomputed-proposal workflow (reference dataset_mapper.py:153-158 /
        # detection_utils transform_proposals): fixed top-K slots + validity
        self.load_proposals = bool(cfg.MODEL.LOAD_PROPOSALS)
        self.proposal_topk = int(
            cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TRAIN
            if is_train
            else cfg.DATASETS.PRECOMPUTED_PROPOSAL_TOPK_TEST
        )
        self.train_size = tuple(cfg.INPUT.TRAIN_SIZE)
        self.test_size = tuple(cfg.INPUT.TEST_SIZE)
        # eval-time resize+paste letterbox; EXACT_MODE keeps the warpAffine
        # formulation whose pixels the parity goldens were captured with
        self.fast_letterbox = bool(cfg.INPUT.FAST_LETTERBOX) and not bool(
            cfg.TEST.EXACT_MODE
        )
        self.affine_aug = CenterAffineAug(
            self.train_size,
            scale_range=tuple(cfg.INPUT.SCALE_RANGE),
            shift_range=float(cfg.INPUT.SHIFT_RANGE),
            flip_prob=0.5 if cfg.INPUT.RANDOM_FLIP != "none" else 0.0,
        )
        # color jitter runs on device inside the train step by default
        # (ops/photometric.py); the host fallback stays for torch-free eval
        # paths or DATALOADER.DEVICE_PHOTOMETRIC=False
        on_host = (
            is_train
            and cfg.INPUT.COLOR_JITTER
            and not cfg.DATALOADER.DEVICE_PHOTOMETRIC
        )
        self.photometric: Optional[PhotometricAug] = (
            PhotometricAug() if on_host else None
        )
        self.flip_prob = 0.5 if cfg.INPUT.RANDOM_FLIP != "none" else 0.0
        self.rotation = (
            RandomRotationAug(
                tuple(cfg.INPUT.ROTATION.ANGLE),
                expand=bool(cfg.INPUT.ROTATION.EXPAND),
                sample_style=str(cfg.INPUT.ROTATION.SAMPLE_STYLE),
            )
            if cfg.INPUT.ROTATION.ENABLED
            else None
        )
        self.crop = (
            RandomCropCategoryAreaConstraint(
                str(cfg.INPUT.CROP.TYPE),
                tuple(cfg.INPUT.CROP.SIZE),
                float(cfg.INPUT.CROP.SINGLE_CATEGORY_MAX_AREA),
                ignored_category=255,
            )
            if cfg.INPUT.CROP.ENABLED
            else None
        )
        self.extent = (
            RandomExtentAug(
                tuple(cfg.INPUT.EXTENT.SCALE_RANGE),
                tuple(cfg.INPUT.EXTENT.SHIFT_RANGE),
            )
            if cfg.INPUT.EXTENT.ENABLED
            else None
        )

    def _train_geometry(
        self, dataset_dict, h, w, rng, out_size
    ) -> np.ndarray:
        """Compose rotation / crop-or-extent / scale-shift-flip into ONE
        source->network 2x3 matrix (one resample regardless of how many
        geometric augmentations are enabled)."""
        m_pre = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float64)
        cur_h, cur_w = h, w
        if self.rotation is not None:
            m_pre, (cur_h, cur_w) = self.rotation(h, w, rng)
        if self.crop is not None or self.extent is not None:
            if self.crop is not None:
                sem = dataset_dict.get("sem_seg")
                if sem is None and "sem_seg_file_name" in dataset_dict:
                    from PIL import Image

                    sem = np.asarray(Image.open(dataset_dict["sem_seg_file_name"]))
                    dataset_dict["sem_seg"] = sem
                # the category constraint inspects the source-frame sem-seg;
                # with rotation enabled the window is sampled pre-rotation
                window = self.crop(
                    cur_h, cur_w, rng,
                    sem_seg=sem if self.rotation is None else None,
                )
            else:
                window = self.extent(cur_h, cur_w, rng)
            m = compose_affine(window_to_output_transform(window, out_size), m_pre)
            if rng.rand() < self.flip_prob:
                flip = np.array(
                    [[-1, 0, out_size[1] - 1], [0, 1, 0]], np.float64
                )
                m = compose_affine(flip, m)
            return m
        return compose_affine(self.affine_aug(cur_h, cur_w, rng), m_pre)

    def __call__(
        self, dataset_dict: dict, rng: Optional[np.random.RandomState] = None
    ) -> Dict[str, np.ndarray]:
        dataset_dict = copy.deepcopy(dataset_dict)
        if "image" in dataset_dict:
            image = np.asarray(dataset_dict.pop("image"))
        else:
            image = utils.read_image(dataset_dict["file_name"], format=self.image_format)
        utils.check_image_size(dataset_dict, image)
        h, w = image.shape[:2]

        warped = None
        if self.is_train:
            if rng is None:
                rng = np.random.RandomState()
            if self.photometric is not None:
                image = self.photometric(image, rng)
            out_size = self.train_size
            m = self._train_geometry(dataset_dict, h, w, rng, out_size)
        else:
            out_size = self.test_size
            if self.fast_letterbox and image.dtype == np.uint8:
                # resize+paste letterbox (~3x cheaper than warpAffine on the
                # single-core host); m becomes the EXACT effective affine
                warped, m = utils.fast_letterbox(image, out_size)
            else:
                m = letterbox_transform(h, w, self.test_size)

        # warp in the source dtype: cv2 is ~2x faster on uint8 and the uint8
        # batch ships 4x fewer bytes to the device (models normalize in f32)
        if warped is None:
            if image.dtype != np.uint8:
                image = image.astype(np.float32)
            warped = utils.warp_image(image, m, out_size)
        if warped.ndim == 2:
            warped = warped[:, :, None]

        out: Dict[str, np.ndarray] = {
            "image": np.ascontiguousarray(warped),
            "warp": m.astype(np.float32),
            "height": np.int32(dataset_dict["height"]),
            "width": np.int32(dataset_dict["width"]),
            "image_id": np.int64(dataset_dict.get("image_id", -1)),
        }

        if self.load_proposals:
            k = self.proposal_topk
            pboxes = np.zeros((k, 4), np.float32)
            plogits = np.full((k,), -1e9, np.float32)
            pvalid = np.zeros((k,), bool)
            raw = dataset_dict.get("proposal_boxes")
            if raw is not None and len(raw):
                raw = np.asarray(raw, np.float32).reshape(-1, 4)
                logits = np.asarray(
                    dataset_dict.get(
                        "proposal_objectness_logits", np.zeros(len(raw))
                    ),
                    np.float32,
                )
                # warp/clip/filter ALL proposals first, then take the top-K
                # survivors by objectness — the reference transform_proposals
                # (detection_utils.py:245-252) backfills from rank K+1 when
                # warping degenerates a top-K box
                b = utils.apply_affine_to_boxes(m, raw)
                np.clip(b[:, 0::2], 0, out_size[1] - 1, out=b[:, 0::2])
                np.clip(b[:, 1::2], 0, out_size[0] - 1, out=b[:, 1::2])
                ok = (b[:, 2] - b[:, 0] > 1e-5) & (b[:, 3] - b[:, 1] > 1e-5)
                b, lg = b[ok], logits[ok]
                order = np.argsort(-lg)[:k]
                b, lg = b[order], lg[order]
                pboxes[: len(b)] = b
                plogits[: len(b)] = lg
                pvalid[: len(b)] = True
            out["proposal_boxes"] = pboxes
            out["proposal_objectness_logits"] = plogits
            out["proposal_valid"] = pvalid

        if self.is_train:
            annos = [
                a for a in dataset_dict.get("annotations", []) if a.get("iscrowd", 0) == 0
            ]
            boxes, classes = utils.annotations_to_boxes(annos)
            boxes = utils.apply_affine_to_boxes(m, boxes)
            if len(boxes):
                np.clip(boxes[:, 0::2], 0, out_size[1] - 1, out=boxes[:, 0::2])
                np.clip(boxes[:, 1::2], 0, out_size[0] - 1, out=boxes[:, 1::2])
            keep = (boxes[:, 2] - boxes[:, 0] > 1e-5) & (boxes[:, 3] - boxes[:, 1] > 1e-5)
            boxes, classes = boxes[keep], classes[keep]
            out.update(utils.pad_to_capacity(boxes, classes, self.max_objs))

            if self.mask_on:
                # fixed-size gt-box-relative rasters; polygons go through the
                # same affine as the boxes (structures/masks.py docstring)
                from ..structures.masks import rasterize_in_box

                r = self.mask_raster
                rasters = np.zeros((self.max_objs, r, r), np.uint8)
                kept_annos = [a for a, k in zip(annos, keep) if k][: self.max_objs]
                for i, (a, box) in enumerate(zip(kept_annos, boxes)):
                    segm = a.get("segmentation")
                    if not segm or isinstance(segm, dict):
                        continue
                    polys = []
                    for p in segm:
                        pts = np.asarray(p, np.float64).reshape(-1, 2)
                        pts = utils.apply_affine_to_points(m, pts)
                        polys.append(pts.reshape(-1))
                    rasters[i] = (rasterize_in_box(polys, box, r) > 0.5).astype(np.uint8)
                out["gt_masks"] = rasters

            if self.keypoint_on:
                kp = np.zeros((self.max_objs, self.num_keypoints, 3), np.float32)
                kept_annos = [a for a, kf in zip(annos, keep) if kf][: self.max_objs]
                for i, a in enumerate(kept_annos):
                    pts = a.get("keypoints")
                    if not pts:
                        continue
                    arr = np.asarray(pts, np.float32).reshape(-1, 3)[: self.num_keypoints]
                    xy = utils.apply_affine_to_points(m, arr[:, :2])
                    vis = arr[:, 2].copy()
                    # points warped outside the canvas become invisible
                    inside = (
                        (xy[:, 0] >= 0) & (xy[:, 0] < out_size[1])
                        & (xy[:, 1] >= 0) & (xy[:, 1] < out_size[0])
                    )
                    vis = np.where(inside, vis, 0)
                    row = np.concatenate([xy, vis[:, None]], axis=1)
                    if m[0, 0] < 0 and self.kp_flip_indices is not None:
                        row = row[self.kp_flip_indices]  # mirrored warp: swap L/R
                    kp[i, : len(row)] = row
                out["gt_keypoints"] = kp

            # semantic segmentation targets (reference dataset_mapper.py:140-150)
            sem = dataset_dict.get("sem_seg")
            if sem is None and "sem_seg_file_name" in dataset_dict:
                from PIL import Image

                sem = np.asarray(Image.open(dataset_dict["sem_seg_file_name"]))
            if sem is not None:
                import cv2

                warped_sem = cv2.warpAffine(
                    np.asarray(sem, np.float64), m.astype(np.float64),
                    (out_size[1], out_size[0]),
                    flags=cv2.INTER_NEAREST, borderValue=255,
                )
                out["sem_seg"] = warped_sem.astype(np.int32)
        return out
