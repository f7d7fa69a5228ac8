"""DensePose for the TPU-native framework.

Counterpart of the reference's largest project
(``/root/reference/projects/DensePose/densepose/``): dense human surface
estimation as an extra per-ROI head on GeneralizedRCNN — the "chart" model:
coarse fg/bg segmentation + 24 fine body-part charts with per-chart (U, V)
surface coordinates.

Registered through the framework's ``ROI_HEAD_EXTENSION_REGISTRY``
(models/roi_heads/extension.py), so enabling it is pure config:

    from densepose_tpu import add_densepose_config
    cfg = get_cfg(); add_densepose_config(cfg)
    cfg.MODEL.ROI_HEADS.EXTENSIONS = ["DensePoseExtension"]
"""

from .bootstrap import (
    CombinedDataLoader,
    DensePoseConfidenceBasedSampler,
    DensePoseUniformSampler,
    FirstKFramesSelector,
    FrameSelectionStrategy,
    ImageListDataset,
    ImageResizeTransform,
    InferenceBasedLoader,
    LastKFramesSelector,
    MaskFromDensePoseSampler,
    RandomKFramesSelector,
    ScoreBasedFilter,
    VideoKeyframeDataset,
    build_frame_selector,
)
from .config import add_densepose_config
from .data import (
    DensePoseDatasetMapper,
    load_densepose_coco_json,
    load_for_dataset,
    load_from_cfg,
)
from .dbhelper import EntrySelector
from .evaluator import DensePoseEvaluator
from .hrnet import HRFPN, HRNet, build_hrfpn_backbone
from .modeling import (
    DensePoseChartPredictor,
    DensePoseDeepLabHead,
    DensePoseExtension,
    DensePoseHead,
)
from .structures import (
    DensePoseDataRelative,
    DensePoseResult,
    DensePoseResultExtractor,
    DensePoseTransformData,
)
from .tta import (
    DensePoseGeneralizedRCNNWithTTA,
    DensePoseTTAPredictor,
    MASK_LABEL_SYMMETRIES,
    POINT_LABEL_SYMMETRIES,
)

__all__ = [
    "add_densepose_config",
    "build_hrfpn_backbone",
    "CombinedDataLoader",
    "DensePoseChartPredictor",
    "DensePoseConfidenceBasedSampler",
    "DensePoseDatasetMapper",
    "DensePoseDataRelative",
    "DensePoseDeepLabHead",
    "DensePoseEvaluator",
    "DensePoseExtension",
    "DensePoseHead",
    "EntrySelector",
    "FirstKFramesSelector",
    "FrameSelectionStrategy",
    "build_frame_selector",
    "ImageListDataset",
    "ImageResizeTransform",
    "LastKFramesSelector",
    "RandomKFramesSelector",
    "DensePoseResult",
    "DensePoseResultExtractor",
    "DensePoseTransformData",
    "load_for_dataset",
    "load_from_cfg",
    "DensePoseGeneralizedRCNNWithTTA",
    "DensePoseTTAPredictor",
    "MASK_LABEL_SYMMETRIES",
    "POINT_LABEL_SYMMETRIES",
    "DensePoseUniformSampler",
    "HRFPN",
    "HRNet",
    "InferenceBasedLoader",
    "load_densepose_coco_json",
    "MaskFromDensePoseSampler",
    "ScoreBasedFilter",
    "VideoKeyframeDataset",
]
