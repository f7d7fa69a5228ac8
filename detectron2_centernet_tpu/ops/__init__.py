from .decode import ctdet_decode, heat_nms
from .deform_conv import modulated_deform_conv
from .target_gen import gaussian_radius, gen_centernet_targets, gen_centernet_targets_batch

__all__ = [
    "ctdet_decode",
    "gaussian_radius",
    "gen_centernet_targets",
    "gen_centernet_targets_batch",
    "heat_nms",
    "modulated_deform_conv",
]
