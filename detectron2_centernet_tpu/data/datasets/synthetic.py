"""Synthetic stand-ins for the benchmark datasets.

The reference's ``dev/run_instant_tests.sh`` assumes COCO is on disk; this
environment (and any CI box) has no datasets, so the quick_schedules
acceptance harness gets synthetic replacements: deterministic random scenes
with box / mask / keypoint / sem-seg / panoptic annotations matching each
builtin name's schema.  Enable with ``DETECTRON2_SYNTH_DATA=1`` (checked by
``tools/train_net.py``) or call :func:`ensure_synthetic_datasets` directly.

Instances are axis-aligned colored rectangles, so a few training iterations
measurably reduce the loss and a perfect evaluator run is well-defined —
enough signal for instant/regression schedules without shipping data.
"""

import logging
from typing import Iterable, Sequence, Tuple

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog
from .builtin_meta import COCO_CATEGORIES

logger = logging.getLogger(__name__)

__all__ = [
    "ensure_synthetic_datasets",
    "register_synthetic_instances",
    "register_learnable_instances",
]

_NUM_KPTS = 17


def _scene(rng, h, w, max_objs):
    img = np.full((h, w, 3), 32, np.uint8)
    annos = []
    for _ in range(rng.randint(1, max_objs + 1)):
        bw, bh = int(rng.randint(12, w // 2)), int(rng.randint(12, h // 2))
        x0 = int(rng.randint(0, w - bw))
        y0 = int(rng.randint(0, h - bh))
        cat = int(rng.randint(0, 80))
        img[y0 : y0 + bh, x0 : x0 + bw] = rng.randint(64, 255, 3)
        poly = [
            float(x0), float(y0), float(x0 + bw), float(y0),
            float(x0 + bw), float(y0 + bh), float(x0), float(y0 + bh),
        ]
        kpts = []
        for k in range(_NUM_KPTS):
            kpts += [
                float(x0 + (k % 4 + 1) * bw / 5.0),
                float(y0 + (k // 4 + 1) * bh / 6.0),
                2.0,
            ]
        annos.append(
            {
                "bbox": [float(x0), float(y0), float(bw), float(bh)],
                "bbox_mode": 1,  # XYWH_ABS
                "category_id": cat,
                "iscrowd": 0,
                "segmentation": [poly],
                "keypoints": kpts,
            }
        )
    return img, annos


def register_synthetic_instances(
    name: str,
    num_images: int = 8,
    image_size: Tuple[int, int] = (96, 128),
    max_objs: int = 4,
    keypoints: bool = False,
    sem_seg: bool = False,
    panoptic: bool = False,
) -> None:
    """Register ``name`` with deterministic synthetic scenes."""
    h, w = image_size

    def load():
        rng = np.random.RandomState(abs(hash(name)) % (2 ** 31))
        dicts = []
        for i in range(num_images):
            img, annos = _scene(rng, h, w, max_objs)
            d = {
                "image": img,
                "file_name": f"synthetic://{name}/{i}.png",
                "height": h,
                "width": w,
                "image_id": i,
                "annotations": annos,
            }
            if sem_seg or panoptic:
                seg = np.zeros((h, w), np.uint8)
                for j, a in enumerate(annos):
                    x0, y0, bw, bh = (int(v) for v in a["bbox"])
                    seg[y0 : y0 + bh, x0 : x0 + bw] = (j % 53) + 1
                d["sem_seg"] = seg
            if panoptic:
                pan = np.zeros((h, w), np.int32)
                segments = []
                for j, a in enumerate(annos):
                    x0, y0, bw, bh = (int(v) for v in a["bbox"])
                    pan[y0 : y0 + bh, x0 : x0 + bw] = j + 1
                    segments.append(
                        {
                            "id": j + 1,
                            "category_id": a["category_id"],
                            "isthing": True,
                            "iscrowd": 0,
                        }
                    )
                d["pan_seg"] = pan
                d["segments_info"] = segments
            dicts.append(d)
        return dicts

    DatasetCatalog.register(name, load)
    thing_classes = [name for _, name in COCO_CATEGORIES]
    meta = MetadataCatalog.get(name)
    meta.set(
        thing_classes=thing_classes,
        evaluator_type="coco_panoptic_seg" if panoptic else "coco",
        synthetic=True,
    )
    if sem_seg or panoptic:
        meta.set(
            stuff_classes=[f"stuff_{i}" for i in range(54)],
            ignore_label=255,
        )
        if not panoptic:
            meta.set(evaluator_type="sem_seg")
    if keypoints:
        from .builtin_meta import COCO_PERSON_KEYPOINT_NAMES, COCO_PERSON_KEYPOINT_FLIP_MAP

        meta.set(
            keypoint_names=COCO_PERSON_KEYPOINT_NAMES,
            keypoint_flip_map=COCO_PERSON_KEYPOINT_FLIP_MAP,
        )


_LEARNABLE_COLORS = np.array(
    [[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.uint8
)  # class identity IS the color: classification is learnable


def register_learnable_instances(
    name: str,
    num_images: int = 24,
    image_size: Tuple[int, int] = (128, 128),
    max_objs: int = 3,
    num_classes: int = 3,
    seed: int = 0,
    keypoints: bool = False,
    sem_seg: bool = False,
) -> None:
    """Synthetic scenes a small detector can actually master.

    ``register_synthetic_instances`` draws the category INDEPENDENTLY of
    appearance (fine for smoke schedules, hopeless for accuracy tests);
    here each class has a fixed color and boxes don't overlap, so a short
    training run reaching high AP is a meaningful regression signal
    (the training_acc_test analog, reference quick_schedules)."""
    h, w = image_size

    def load():
        rng = np.random.RandomState(seed)
        dicts = []
        for i in range(num_images):
            img = np.full((h, w, 3), 32, np.uint8)
            annos = []
            # 2x2 grid of cells; boxes fill 40-90% of a cell per side, so
            # aspect ratios stay within the default anchor set's [0.5, 2]
            # and sizes sit on the P3/P4 anchors (a detector that can't
            # match a GT to any anchor can't learn it, whatever the loss)
            cell_w, cell_h = w // 2, h // 2
            cells = rng.permutation(4)[: rng.randint(1, max_objs + 1)]
            for j in cells:
                cat = int(rng.randint(0, num_classes))
                bw = int(rng.randint(int(cell_w * 0.4), int(cell_w * 0.9)))
                bh = int(rng.randint(int(cell_h * 0.4), int(cell_h * 0.9)))
                x0 = (int(j) % 2) * cell_w + int(rng.randint(0, cell_w - bw))
                y0 = (int(j) // 2) * cell_h + int(rng.randint(0, cell_h - bh))
                img[y0 : y0 + bh, x0 : x0 + bw] = _LEARNABLE_COLORS[cat]
                poly = [
                    float(x0), float(y0), float(x0 + bw), float(y0),
                    float(x0 + bw), float(y0 + bh), float(x0), float(y0 + bh),
                ]
                anno = {
                    "bbox": [float(x0), float(y0), float(bw), float(bh)],
                    "bbox_mode": 1,  # XYWH_ABS
                    "category_id": cat,
                    "iscrowd": 0,
                    "segmentation": [poly],
                }
                if keypoints:
                    # fixed box-relative fractions: "keypoint k sits at a
                    # fixed spot in the box" is exactly learnable, and the
                    # 4x5 grid keeps every keypoint visible and distinct
                    kpts = []
                    for k in range(_NUM_KPTS):
                        kpts += [
                            float(x0 + (k % 4 + 1) * bw / 5.0),
                            float(y0 + (k // 4 + 1) * bh / 6.0),
                            2.0,
                        ]
                    anno["keypoints"] = kpts
                annos.append(anno)
            d = {
                "image": img,
                "file_name": f"synthetic://{name}/{i}.png",
                "height": h,
                "width": w,
                "image_id": i,
                "annotations": annos,
            }
            if sem_seg:
                # stuff label = color identity (+1; 0 is background):
                # learnable pixel-wise from color alone
                seg = np.zeros((h, w), np.uint8)
                for a in annos:
                    x0, y0, bw, bh = (int(v) for v in a["bbox"])
                    seg[y0 : y0 + bh, x0 : x0 + bw] = a["category_id"] + 1
                d["sem_seg"] = seg
            dicts.append(d)
        return dicts

    DatasetCatalog.register(name, load)
    meta = MetadataCatalog.get(name)
    meta.set(
        thing_classes=[f"color_{i}" for i in range(num_classes)],
        evaluator_type="sem_seg" if sem_seg else "coco",
        synthetic=True,
    )
    if sem_seg:
        meta.set(
            stuff_classes=["background"]
            + [f"color_{i}" for i in range(num_classes)],
            ignore_label=255,
        )
    if keypoints:
        from .builtin_meta import (
            COCO_PERSON_KEYPOINT_FLIP_MAP,
            COCO_PERSON_KEYPOINT_NAMES,
        )

        meta.set(
            keypoint_names=COCO_PERSON_KEYPOINT_NAMES,
            keypoint_flip_map=COCO_PERSON_KEYPOINT_FLIP_MAP,
        )


def ensure_synthetic_datasets(names: Iterable[str]) -> None:
    """Register synthetic stand-ins for any unregistered-or-unloadable
    builtin names (quick_schedules use *_val_100 and panoptic variants)."""
    for name in names:
        if not name:
            continue
        if name in DatasetCatalog:
            try:
                DatasetCatalog.get(name)
                continue  # real data loads fine
            except Exception:  # registered but files missing -> replace
                DatasetCatalog.remove(name)
                try:
                    MetadataCatalog.remove(name)
                except Exception:
                    pass
        if name.startswith("synth_learnable"):
            # the training-accuracy dataset (class == color, no overlap);
            # train and test on the same scenes, like the reference's
            # *training_acc_test.yaml reusing coco_2017_val_100.  Name
            # suffixes select the annotation flavor: _kp adds box-relative
            # keypoints (single class, like person keypoints), _semseg adds
            # color-identity stuff labels.
            if "_kp" in name:
                register_learnable_instances(name, keypoints=True, num_classes=1)
            elif "_semseg" in name:
                register_learnable_instances(name, sem_seg=True)
            else:
                register_learnable_instances(name)
            continue
        register_synthetic_instances(
            name,
            keypoints="keypoint" in name,
            sem_seg="stuffonly" in name or "sem_seg" in name,
            panoptic="panoptic_separated" in name,
        )
        logger.warning("registered synthetic stand-in for dataset '%s'", name)
