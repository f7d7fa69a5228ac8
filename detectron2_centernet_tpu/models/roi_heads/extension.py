"""Pluggable per-ROI heads for GeneralizedRCNN.

The reference composes extra ROI heads by subclassing ``StandardROIHeads``
inside a ``ROI_HEADS_REGISTRY`` (e.g. DensePose's ``DensePoseROIHeads``,
``/root/reference/projects/DensePose/densepose/modeling/roi_heads/roi_head.py:85``).
In this framework the whole R-CNN step is one jitted function, so the
extension point is functional instead: a project registers an
:class:`ROIHeadExtension` whose hooks run inside ``loss_fn``/``predict_fn``
with access to the pooled-feature machinery — no edits to ``rcnn.py``.

Usage (see ``projects/DensePose``):

    @ROI_HEAD_EXTENSION_REGISTRY.register()
    class DensePoseExtension(ROIHeadExtension):
        name = "densepose" ...

    cfg.MODEL.ROI_HEADS.EXTENSIONS = ["DensePoseExtension"]
"""

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

from ...utils.registry import Registry

ROI_HEAD_EXTENSION_REGISTRY = Registry("ROI_HEAD_EXTENSION")


@dataclasses.dataclass
class ROIContext:
    """Everything an extension hook may need, precomputed by the meta-arch.

    ``pool(boxes_flat, batch_idx, resolution)`` pools multi-level features
    for flat rois; ``apply(name, *args, train=...)`` invokes the extension's
    own flax module (registered under its ``name``) with the current
    variables.
    """

    feats: Dict[str, Any]
    pool: Callable
    apply: Callable
    n: int  # batch size
    num_classes: int
    image_hw: Tuple[int, int]
    rng: Any = None
    batch: Optional[Dict[str, Any]] = None
    sampled: Optional[Dict[str, Any]] = None  # (N, S, ...) training samples
    flat_sampled: Optional[Dict[str, Any]] = None  # (N*S, ...)
    dets: Optional[Dict[str, Any]] = None  # inference detections


class ROIHeadExtension:
    """Base class. Subclass per project, register, list in
    ``MODEL.ROI_HEADS.EXTENSIONS``."""

    #: unique key; the extension's flax module is addressable under it
    name: str = ""

    def __init__(self, cfg):
        self.cfg = cfg

    def build_module(self, dtype):
        """Return the flax module holding this head's parameters."""
        raise NotImplementedError

    def init_shapes(self, channels: int):
        """Example-argument shapes for parameter init: a list of arg arrays
        (built by the caller as zeros) — return list of (shape, dtype)."""
        raise NotImplementedError

    def loss(self, ctx: ROIContext) -> Dict[str, Any]:
        """Training hook: return {loss_name: scalar}."""
        return {}

    def inference(self, ctx: ROIContext) -> Dict[str, Any]:
        """Inference hook: return extra per-detection fields."""
        return {}


def build_roi_head_extensions(cfg):
    names = list(cfg.MODEL.ROI_HEADS.EXTENSIONS)
    # the reference's DensePose configs select the head via
    # ROI_HEADS.NAME "DensePoseROIHeads" (densepose/roi_head.py); here the
    # same capability is the DensePoseExtension plug-in, so those configs
    # load unmodified
    if (
        cfg.MODEL.ROI_HEADS.NAME == "DensePoseROIHeads"
        and "DensePoseExtension" in ROI_HEAD_EXTENSION_REGISTRY
        and "DensePoseExtension" not in names
    ):
        names.append("DensePoseExtension")
    return [ROI_HEAD_EXTENSION_REGISTRY.get(name)(cfg) for name in names]
