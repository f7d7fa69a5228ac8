"""DensePose config keys (reference densepose/config.py:14-164: data,
bootstrap, chart head, decoder, DeepLab head, confidence, HRNet)."""

from detectron2_centernet_tpu.config import CfgNode as CN


def add_dataset_category_config(cfg: CN) -> None:
    """Category-remap / whitelist keys (reference densepose/config.py:9-19):
    the evolution configs retarget non-person categories onto person."""
    cfg.DATASETS.CATEGORY_MAPS = CN(new_allowed=True)
    cfg.DATASETS.WHITELISTED_CATEGORIES = CN(new_allowed=True)


def add_bootstrap_config(cfg: CN) -> None:
    """Bootstrapping-pipeline keys (reference densepose/config.py:22-56)."""
    cfg.BOOTSTRAP_DATASETS = []
    cfg.BOOTSTRAP_MODEL = CN()
    cfg.BOOTSTRAP_MODEL.WEIGHTS = ""


def add_hrnet_config(cfg: CN) -> None:
    """HigherHRNet-w32 trunk keys (reference densepose/config.py:135-164)."""
    h = CN()
    h.STEM_INPLANES = 64
    for name, modules, branches, blocks, chans in (
        ("STAGE2", 1, 2, [4, 4], [32, 64]),
        ("STAGE3", 4, 3, [4, 4, 4], [32, 64, 128]),
        ("STAGE4", 3, 4, [4, 4, 4, 4], [32, 64, 128, 256]),
    ):
        s = CN()
        s.NUM_MODULES = modules
        s.NUM_BRANCHES = branches
        s.BLOCK = "BASIC"
        s.NUM_BLOCKS = blocks
        s.NUM_CHANNELS = chans
        s.FUSE_METHOD = "SUM"
        setattr(h, name, s)
    h.HRFPN = CN()
    h.HRFPN.OUT_CHANNELS = 256
    cfg.MODEL.HRNET = h


def add_densepose_config(cfg: CN) -> None:
    cfg.MODEL.DENSEPOSE_ON = True
    add_dataset_category_config(cfg)
    add_bootstrap_config(cfg)
    add_hrnet_config(cfg)
    cfg.INPUT.ROTATION_ANGLES = [0]
    if not hasattr(cfg.TEST.AUG, "ROTATION_ANGLES"):
        cfg.TEST.AUG.ROTATION_ANGLES = ()

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
    # coarse segmentation supervised by instance masks instead of DP masks
    c.COARSE_SEGM_TRAINED_BY_MASKS = False
    # FPN decoder in front of the head (reference config.py:103-107)
    c.DECODER_ON = True
    c.DECODER_NUM_CLASSES = 256
    c.DECODER_CONV_DIMS = 256
    c.DECODER_NORM = ""
    c.DECODER_COMMON_STRIDE = 4
    # DensePoseDeepLabHead (reference config.py:109-111)
    c.DEEPLAB = CN()
    c.DEEPLAB.NORM = "GN"
    c.DEEPLAB.NONLOCAL_ON = 0
    # TPU additions: static capacities (reference uses ragged per-instance
    # point lists; XLA needs fixed shapes)
    c.MAX_DP_POINTS = 196  # annotated IUV points per instance
    c.SEGM_RASTER = 64  # gt coarse-mask raster resolution (gt-box relative)
    c.MAX_DETECTIONS = 20  # detections carrying dense outputs at inference
    cfg.MODEL.ROI_DENSEPOSE_HEAD = c
