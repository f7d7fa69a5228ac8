"""TridentNet meta-architecture (reference ``projects/TridentNet``).

A C4 Faster R-CNN over the weight-shared trident backbone: training folds
the 3 branches into the batch (ground truth tiled per branch); inference
runs the middle branch only (the "Fast" approximation the reference's
trident_fast configs use), so predict/postprocess are inherited unchanged.
"""

import jax.numpy as jnp

from ...config import CfgNode
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
