"""DensePose config keys (reference densepose/config.py:74-126, chart model)."""

from detectron2_centernet_tpu.config import CfgNode as CN


def add_densepose_config(cfg: CN) -> None:
    cfg.MODEL.DENSEPOSE_ON = True

    c = CN()
    c.NAME = "DensePoseV1ConvXHead"
    c.NUM_STACKED_CONVS = 8
    c.NUM_PATCHES = 24
    c.DECONV_KERNEL = 4
    c.CONV_HEAD_DIM = 512
    c.CONV_HEAD_KERNEL = 3
    c.UP_SCALE = 2
    c.HEATMAP_SIZE = 112
    c.POOLER_TYPE = "ROIAlignV2"
    c.POOLER_RESOLUTION = 28
    c.POOLER_SAMPLING_RATIO = 2
    c.NUM_COARSE_SEGM_CHANNELS = 2
    c.FG_IOU_THRESHOLD = 0.7
    c.INDEX_WEIGHTS = 5.0
    c.PART_WEIGHTS = 1.0
    c.POINT_REGRESSION_WEIGHTS = 0.01
    # confidence estimation (reference densepose/config.py:100-115 +
    # modeling/confidence.py; Neverova et al., NeurIPS 2019)
    c.UV_CONFIDENCE = CN()
    c.UV_CONFIDENCE.ENABLED = False
    c.UV_CONFIDENCE.TYPE = "iid_iso"  # or "indep_aniso"
    c.UV_CONFIDENCE.EPSILON = 0.01  # lower bound on sigma^2
    c.SEGM_CONFIDENCE = CN()
    c.SEGM_CONFIDENCE.ENABLED = False
    c.SEGM_CONFIDENCE.EPSILON = 0.01
    # TPU additions: static capacities (reference uses ragged per-instance
    # point lists; XLA needs fixed shapes)
    c.MAX_DP_POINTS = 196  # annotated IUV points per instance
    c.SEGM_RASTER = 64  # gt coarse-mask raster resolution (gt-box relative)
    c.MAX_DETECTIONS = 20  # detections carrying dense outputs at inference
    cfg.MODEL.ROI_DENSEPOSE_HEAD = c
