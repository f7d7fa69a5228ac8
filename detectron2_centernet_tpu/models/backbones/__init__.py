from .dla import DLA34, DLATrunk, DLAUp, IDAUp, build_dla34_backbone
from .resnet import (
    ResNet,
    ResNetDeconv,
    build_resnet_backbone,
    build_resnet_deconv_backbone,
)
from .vovnet import VoVNet, build_vovnet_backbone
from .fpn import FPN, build_resnet_fpn_backbone, build_retinanet_resnet_fpn_backbone
from .trident import TridentResNet, build_trident_resnet_backbone

__all__ = [
    "DLA34",
    "DLATrunk",
    "DLAUp",
    "IDAUp",
    "ResNet",
    "ResNetDeconv",
    "VoVNet",
    "build_dla34_backbone",
    "build_resnet_backbone",
    "build_resnet_deconv_backbone",
    "build_vovnet_backbone",
]
