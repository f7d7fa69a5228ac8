from .centernet import CenterNet, CenterNetModel, focal_loss, reg_l1_loss
from .panoptic_fpn import PanopticFPN
from .rcnn import GeneralizedRCNN, ProposalNetwork
from .rotated_rcnn import RotatedRCNN
from .trident_rcnn import TridentRCNN
from .semantic_seg import SemanticSegmentor, SemSegFPNHead
from .retinanet import RetinaNet, RetinaNetHead, sigmoid_focal_loss, smooth_l1

__all__ = [
    "CenterNet",
    "GeneralizedRCNN",
    "PanopticFPN",
    "SemanticSegmentor",
    "SemSegFPNHead",
    "ProposalNetwork",
    "RotatedRCNN",
    "TridentRCNN",
    "CenterNetModel",
    "RetinaNet",
    "RetinaNetHead",
    "focal_loss",
    "reg_l1_loss",
    "sigmoid_focal_loss",
    "smooth_l1",
]
