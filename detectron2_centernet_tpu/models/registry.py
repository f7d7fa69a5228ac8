"""Model-component registries (reference: modeling/meta_arch/build.py:10-14,
backbone/build.py:7, proposal_generator, roi_heads, anchor registries)."""

from ..utils.registry import Registry

META_ARCH_REGISTRY = Registry("META_ARCH")
BACKBONE_REGISTRY = Registry("BACKBONE")
PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")
ROI_HEADS_REGISTRY = Registry("ROI_HEADS")
ANCHOR_GENERATOR_REGISTRY = Registry("ANCHOR_GENERATOR")
RPN_HEAD_REGISTRY = Registry("RPN_HEAD")
