"""TensorMask config keys (reference
``/root/reference/projects/TensorMask/tensormask/config.py:7-51``)."""

from detectron2_centernet_tpu.config import CfgNode as CN


def add_tensormask_config(cfg):
    cfg.MODEL.TENSOR_MASK = CN()

    # Anchor parameters
    cfg.MODEL.TENSOR_MASK.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6", "p7"]
    # Convolutions to use in the towers
    cfg.MODEL.TENSOR_MASK.NUM_CONVS = 4
    # Number of foreground classes.
    cfg.MODEL.TENSOR_MASK.NUM_CLASSES = 80
    # Channel size for the classification tower
    cfg.MODEL.TENSOR_MASK.CLS_CHANNELS = 256

    cfg.MODEL.TENSOR_MASK.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.TENSOR_MASK.TOPK_CANDIDATES_TEST = 6000
    cfg.MODEL.TENSOR_MASK.NMS_THRESH_TEST = 0.5

    # Box parameters
    cfg.MODEL.TENSOR_MASK.BBOX_CHANNELS = 128
    cfg.MODEL.TENSOR_MASK.BBOX_REG_WEIGHTS = (1.5, 1.5, 0.75, 0.75)

    # Loss parameters
    cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_GAMMA = 3.0
    cfg.MODEL.TENSOR_MASK.FOCAL_LOSS_ALPHA = 0.3

    # Mask parameters
    cfg.MODEL.TENSOR_MASK.MASK_CHANNELS = 128
    cfg.MODEL.TENSOR_MASK.MASK_LOSS_WEIGHT = 2.0
    cfg.MODEL.TENSOR_MASK.POSITIVE_WEIGHT = 1.5
    cfg.MODEL.TENSOR_MASK.ALIGNED_ON = False
    cfg.MODEL.TENSOR_MASK.BIPYRAMID_ON = False

    # TPU fixed-shape addition: max foreground masks supervised per
    # (image, level, anchor-type) — the reference supervises every fg anchor
    # with host-side variable-length lists (arch.py:588-611); a fixed cap
    # keeps the mask loss jittable.  Overflowing fg anchors still train the
    # cls/box losses.
    cfg.MODEL.TENSOR_MASK.MAX_MASKS_PER_LEVEL = 24
