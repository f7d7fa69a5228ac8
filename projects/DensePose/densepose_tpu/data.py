"""DensePose-COCO data loading + fixed-shape mapper.

Reference: ``densepose/data/datasets/coco.py`` (dp_* annotation keys),
``densepose/data/dataset_mapper.py`` and ``densepose/data/structures.py``
(DensePoseDataRelative: per-instance dp points in 256-normalized gt-box
coordinates, dp_masks as 14-part run-length rasters).

TPU redesign: each instance's ragged point list is packed into
``(MAX_DP_POINTS,)`` arrays with a validity mask, and the coarse
segmentation raster becomes a fixed ``(SEGM_RASTER, SEGM_RASTER)`` fg/bg
byte mask in gt-box coordinates (consumed by ``crop_gt_masks`` in the
loss).  Mirrored samples follow the reference's hardcoded label-symmetry
protocol (structures.py:13-16 + :194-208: x -> 256 - x, part-label swap,
segm mirror); the within-part U/V symmetry lookup is external data the
reference downloads (the .mat, structures.py:43-63), so mirrored samples
keep part/segm supervision but mask out U/V point regression via
``gt_dp_uv_valid`` — a documented deviation.
"""

import os
from typing import Dict, List, Optional

import numpy as np

from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
from detectron2_centernet_tpu.data.dataset_mapper import DatasetMapper
from detectron2_centernet_tpu.data.datasets.coco import load_coco_json
from detectron2_centernet_tpu.structures.rle import rle_to_mask

DENSEPOSE_KEYS = ["dp_x", "dp_y", "dp_I", "dp_U", "dp_V", "dp_masks"]


def load_densepose_coco_json(json_file: str, image_root: str, dataset_name=None):
    """COCO json with dp_* per-annotation keys preserved."""
    return load_coco_json(
        json_file, image_root, dataset_name, extra_annotation_keys=DENSEPOSE_KEYS
    )


def register_densepose_coco(name: str, json_file: str, image_root: str) -> None:
    DatasetCatalog.register(
        name, lambda: load_densepose_coco_json(json_file, image_root, name)
    )
    MetadataCatalog.get(name).set(
        json_file=json_file,
        image_root=image_root,
        evaluator_type="densepose",
        thing_classes=["person"],
    )


def _dp_mask_to_fg(dp_masks, raster: int) -> np.ndarray:
    """14 per-part RLEs (256x256 gt-box frame) -> (raster, raster) fg mask."""
    fg = np.zeros((256, 256), bool)
    for part in dp_masks or []:
        if not part:
            continue
        fg |= rle_to_mask(part)
    if raster == 256:
        return fg.astype(np.uint8)
    step = 256 // raster
    return (
        fg[: raster * step, : raster * step]
        .reshape(raster, step, raster, step)
        .max(axis=(1, 3))
        .astype(np.uint8)
    )


class DensePoseDatasetMapper(DatasetMapper):
    """DatasetMapper + fixed-shape dense-pose targets."""

    def __init__(self, cfg, is_train: bool = True) -> None:
        super().__init__(cfg, is_train)
        c = cfg.MODEL.ROI_DENSEPOSE_HEAD
        self.dp_points = int(c.MAX_DP_POINTS)
        self.dp_raster = int(c.SEGM_RASTER)
        # UV chart-symmetry lookup for mirrored samples (None -> mirrored
        # points carry no U/V loss, the label-only protocol)
        self.dp_transform_data = (
            load_for_dataset(cfg.DATASETS.TRAIN[0])
            if is_train and cfg.DATASETS.TRAIN else None
        )

    def __call__(self, dataset_dict: dict, rng=None) -> Dict[str, np.ndarray]:
        annos = [
            a for a in dataset_dict.get("annotations", [])
            if a.get("iscrowd", 0) == 0
        ]
        out = super().__call__(dataset_dict, rng)
        if not self.is_train:
            return out

        m = out["warp"]
        mirrored = m[0, 0] < 0
        p, cap = self.dp_points, self.max_objs
        dp_x = np.zeros((cap, p), np.float32)
        dp_y = np.zeros((cap, p), np.float32)
        dp_i = np.zeros((cap, p), np.int32)
        dp_u = np.zeros((cap, p), np.float32)
        dp_v = np.zeros((cap, p), np.float32)
        dp_valid = np.zeros((cap, p), np.float32)
        dp_uv_valid = np.zeros((cap, p), np.float32)
        dp_segm = np.zeros((cap, self.dp_raster, self.dp_raster), np.uint8)

        # the parent mapper filtered/capped annos the same way: re-derive the
        # kept order (boxes through the warp, nonempty)
        from detectron2_centernet_tpu.data import detection_utils as utils

        boxes, _ = utils.annotations_to_boxes(annos)
        boxes = utils.apply_affine_to_boxes(m, boxes)
        hcap = out["image"].shape[0] - 1
        wcap = out["image"].shape[1] - 1
        if len(boxes):
            np.clip(boxes[:, 0::2], 0, wcap, out=boxes[:, 0::2])
            np.clip(boxes[:, 1::2], 0, hcap, out=boxes[:, 1::2])
        keep = (boxes[:, 2] - boxes[:, 0] > 1e-5) & (boxes[:, 3] - boxes[:, 1] > 1e-5)
        kept = [a for a, k in zip(annos, keep) if k][:cap]

        from .tta import POINT_LABEL_SYMMETRIES

        pt_sym = np.asarray(POINT_LABEL_SYMMETRIES, np.int32)
        for i, a in enumerate(kept):
            if "dp_x" not in a or a.get("dp_x") is None:
                continue
            xs = np.asarray(a["dp_x"], np.float32)[:p]
            n_pts = len(xs)
            if n_pts == 0:
                continue
            ids = np.clip(
                np.asarray(a["dp_I"], np.float32)[:p].astype(np.int32), 0, 24
            )
            us = np.clip(np.asarray(a["dp_U"], np.float32)[:p], 0, 1)
            vs = np.clip(np.asarray(a["dp_V"], np.float32)[:p], 0, 1)
            uv_ok = 1.0
            if mirrored:
                # reference flip protocol (structures.py:180-208): mirror x
                # in the 256 gt-box frame, remap U/V through the chart
                # symmetry (indexed by the PRE-swap label), then swap
                # left/right part labels.  Without the external .mat the
                # U/V lookup is unavailable and they carry no loss.
                xs = 256.0 - xs
                if self.dp_transform_data is not None:
                    us, vs = self.dp_transform_data.apply_uv(ids, us, vs)
                else:
                    uv_ok = 0.0
                ids = pt_sym[ids]
            dp_x[i, :n_pts] = xs
            dp_y[i, :n_pts] = np.asarray(a["dp_y"], np.float32)[:p]
            dp_i[i, :n_pts] = ids
            dp_u[i, :n_pts] = us
            dp_v[i, :n_pts] = vs
            dp_valid[i, :n_pts] = 1.0
            dp_uv_valid[i, :n_pts] = uv_ok
            if a.get("dp_masks") is not None:
                fg = _dp_mask_to_fg(a["dp_masks"], self.dp_raster)
                dp_segm[i] = fg[:, ::-1] if mirrored else fg

        out.update(
            gt_dp_x=dp_x, gt_dp_y=dp_y, gt_dp_I=dp_i, gt_dp_U=dp_u,
            gt_dp_V=dp_v, gt_dp_valid=dp_valid, gt_dp_uv_valid=dp_uv_valid,
            gt_dp_segm=dp_segm,
        )
        return out


# ---------------------------------------------------------------------------
# Category retargeting (the "evolution" configs: animal categories retrained
# onto the person chart; reference densepose/data/build.py:214-258)
# ---------------------------------------------------------------------------

def load_for_dataset(dataset_name: str):
    """Load the dataset's UV-symmetry transform data, or None.

    Reference ``densepose/utils/transform.py::load_for_dataset`` reads the
    ``densepose_transform_src`` metadata path (the external
    ``UV_symmetry_transforms.mat``).  Returns None when the metadata or the
    file is absent so flip paths degrade to the label-only protocol."""
    from .structures import DensePoseTransformData

    path = getattr(MetadataCatalog.get(dataset_name),
                   "densepose_transform_src", None)
    if not path or not os.path.exists(path):
        return None
    return DensePoseTransformData.load(path)


def load_from_cfg(cfg):
    """Transform data for the first TEST dataset (reference
    utils/transform.py::load_from_cfg)."""
    return load_for_dataset(cfg.DATASETS.TEST[0]) if cfg.DATASETS.TEST else None


def add_category_whitelists_to_metadata(cfg) -> None:
    """DATASETS.WHITELISTED_CATEGORIES -> per-dataset metadata."""
    for dataset_name, cat_ids in cfg.DATASETS.WHITELISTED_CATEGORIES.items():
        MetadataCatalog.get(dataset_name).whitelisted_categories = list(cat_ids)


def add_category_maps_to_metadata(cfg) -> None:
    """DATASETS.CATEGORY_MAPS -> per-dataset metadata ({src: dst} ints)."""
    for dataset_name, category_map in cfg.DATASETS.CATEGORY_MAPS.items():
        MetadataCatalog.get(dataset_name).category_map = {
            int(src): int(dst) for src, dst in dict(category_map).items()
        }


def filter_and_map_categories(dataset_name: str, dataset_dicts: list) -> list:
    """Drop non-whitelisted annotations and remap category ids per the
    dataset's metadata (reference _maybe_filter_and_map_categories)."""
    meta = MetadataCatalog.get(dataset_name)
    whitelisted = meta.get("whitelisted_categories")
    category_map = meta.get("category_map", {}) or {}
    if whitelisted is None and not category_map:
        return dataset_dicts
    out = []
    for d in dataset_dicts:
        anns = []
        for ann in d.get("annotations", []):
            cat_id = ann["category_id"]
            if whitelisted is not None and cat_id not in whitelisted:
                continue
            ann["category_id"] = category_map.get(cat_id, cat_id)
            anns.append(ann)
        d["annotations"] = anns
        out.append(d)
    return out


def combine_detection_dataset_dicts(dataset_names, cfg=None) -> list:
    """Concatenate several datasets' dicts with per-dataset category
    retargeting applied (reference combine_detection_dataset_dicts,
    build.py:259-300)."""
    if cfg is not None:
        add_category_whitelists_to_metadata(cfg)
        add_category_maps_to_metadata(cfg)
    dicts = []
    for name in dataset_names:
        dicts.extend(filter_and_map_categories(name, DatasetCatalog.get(name)))
    return dicts
