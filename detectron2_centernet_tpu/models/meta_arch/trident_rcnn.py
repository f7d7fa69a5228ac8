"""TridentNet meta-architecture (reference ``projects/TridentNet``).

A C4 Faster R-CNN over the weight-shared trident backbone: training folds
the 3 branches into the batch (ground truth tiled per branch).  Inference
follows ``MODEL.TRIDENT.TEST_BRANCH_IDX``: ``>= 0`` runs that single branch
(the "Fast" mode of the reference's trident_fast configs; predict/
postprocess inherited unchanged), ``-1`` runs every branch on a tiled batch
and merges the per-branch detections with class-aware NMS — the reference's
``merge_branch_instances`` (trident_rcnn.py:8-44) as one fixed-K jitted op.
"""

import jax
import jax.numpy as jnp

from ...config import CfgNode
from ...ops.nms import batched_nms_fixed
from ..registry import META_ARCH_REGISTRY
from .rcnn import GeneralizedRCNN


@META_ARCH_REGISTRY.register()
class TridentRCNN(GeneralizedRCNN):
    def __init__(self, cfg: CfgNode) -> None:
        assert cfg.MODEL.BACKBONE.NAME == "build_trident_resnet_backbone", (
            "TridentRCNN requires the trident backbone"
        )
        super().__init__(cfg)
        self.num_branch = self.backbone.num_branch
        self.test_branch_idx = int(cfg.MODEL.TRIDENT.TEST_BRANCH_IDX)

    def loss_fn(self, params, batch_stats, batch):
        nb = self.num_branch
        batch = dict(batch)
        for k in ("gt_boxes", "gt_classes", "gt_valid"):
            batch[k] = jnp.tile(
                batch[k], (nb,) + (1,) * (batch[k].ndim - 1)
            )
        if "gt_masks" in batch:
            batch["gt_masks"] = jnp.tile(batch["gt_masks"], (nb, 1, 1, 1))
        return super().loss_fn(params, batch_stats, batch)

    def predict_fn(self, variables, images, **kw):
        if self.test_branch_idx >= 0:  # Fast mode: middle/indexed branch
            return super().predict_fn(variables, images, **kw)
        nb = self.num_branch
        dets = super().predict_fn(
            variables, jnp.tile(images, (nb, 1, 1, 1)), **kw
        )
        n = images.shape[0]

        def fold(a):  # (nb*n, K, ...) -> (n, nb*K, ...), branch-major tile
            return jnp.concatenate(jnp.split(a, nb, axis=0), axis=1)

        boxes, scores, classes = (
            fold(dets["boxes"]), fold(dets["scores"]), fold(dets["classes"])
        )

        def merge_one(b, s, c):
            sc = jnp.where(s > 0, s, -jnp.inf)  # 0.0 = empty det slot
            keep, valid = batched_nms_fixed(
                b, sc, c, self.nms_threshold, self.max_detections
            )
            return {
                "boxes": b[keep],
                "scores": jnp.where(valid, s[keep], 0.0),
                "classes": c[keep],
            }

        merged = jax.vmap(merge_one)(boxes, scores, classes)
        # non-box extras (C4 trident has none, but stay permissive): take
        # the middle branch's outputs untouched
        mid = nb // 2
        for k, v in dets.items():
            if k not in merged:
                merged[k] = v[mid * n : (mid + 1) * n]
        return merged
