from . import backbones, meta_arch  # noqa: F401  (populate registries)
from .build import build_model
from .test_time_augmentation import GeneralizedRCNNWithTTA, TTAPredictor
from .registry import (
    ANCHOR_GENERATOR_REGISTRY,
    BACKBONE_REGISTRY,
    META_ARCH_REGISTRY,
    PROPOSAL_GENERATOR_REGISTRY,
    ROI_HEADS_REGISTRY,
    RPN_HEAD_REGISTRY,
)

__all__ = [
    "ANCHOR_GENERATOR_REGISTRY",
    "BACKBONE_REGISTRY",
    "META_ARCH_REGISTRY",
    "PROPOSAL_GENERATOR_REGISTRY",
    "ROI_HEADS_REGISTRY",
    "RPN_HEAD_REGISTRY",
    "GeneralizedRCNNWithTTA",
    "TTAPredictor",
    "build_model",
]
