from .centernet import CenterNet, CenterNetModel, focal_loss, reg_l1_loss
from .rcnn import GeneralizedRCNN, ProposalNetwork
from .retinanet import RetinaNet, RetinaNetHead, sigmoid_focal_loss, smooth_l1

__all__ = [
    "CenterNet",
    "GeneralizedRCNN",
    "ProposalNetwork",
    "CenterNetModel",
    "RetinaNet",
    "RetinaNetHead",
    "focal_loss",
    "reg_l1_loss",
    "sigmoid_focal_loss",
    "smooth_l1",
]
