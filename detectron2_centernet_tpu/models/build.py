"""Model factory (reference modeling/meta_arch/build.py:15-23)."""

from ..config import CfgNode
from .registry import META_ARCH_REGISTRY


def build_model(cfg: CfgNode):
    """Instantiate the meta-architecture named by MODEL.META_ARCHITECTURE."""
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    return META_ARCH_REGISTRY.get(meta_arch)(cfg)
