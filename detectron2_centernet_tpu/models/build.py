"""Model factory (reference modeling/meta_arch/build.py:15-23)."""

from ..config import CfgNode
from .registry import META_ARCH_REGISTRY


def build_model(cfg: CfgNode):
    """Instantiate the meta-architecture named by MODEL.META_ARCHITECTURE.

    Reference rotated configs keep META_ARCHITECTURE "GeneralizedRCNN" and
    select the rotated components by name (PROPOSAL_GENERATOR "RRPN" /
    ROI_HEADS "RROIHeads"); honor that convention here.
    """
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    if meta_arch == "GeneralizedRCNN" and (
        cfg.MODEL.PROPOSAL_GENERATOR.NAME == "RRPN"
        or cfg.MODEL.ROI_HEADS.NAME == "RROIHeads"
    ):
        meta_arch = "RotatedRCNN"
    return META_ARCH_REGISTRY.get(meta_arch)(cfg)
