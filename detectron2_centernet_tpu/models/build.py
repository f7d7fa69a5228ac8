"""Model factory (reference modeling/meta_arch/build.py:15-23)."""

from ..config import CfgNode
from .registry import META_ARCH_REGISTRY


def build_model(cfg: CfgNode):
    """Instantiate the meta-architecture named by MODEL.META_ARCHITECTURE.

    Reference rotated configs keep META_ARCHITECTURE "GeneralizedRCNN" and
    select the rotated components by name (PROPOSAL_GENERATOR "RRPN" /
    ROI_HEADS "RROIHeads"); honor that convention here.
    """
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    if meta_arch == "GeneralizedRCNN" and (
        cfg.MODEL.PROPOSAL_GENERATOR.NAME == "RRPN"
        or cfg.MODEL.ROI_HEADS.NAME == "RROIHeads"
    ):
        meta_arch = "RotatedRCNN"
    model = META_ARCH_REGISTRY.get(meta_arch)(cfg)
    # batch-level device-side train augmentation hook (applied by the train
    # step before loss_fn; see ops/photometric.py for why it lives on device)
    if (
        getattr(model, "device_augment", None) is None
        and cfg.DATALOADER.DEVICE_PHOTOMETRIC
    ):
        if cfg.INPUT.COLOR_AUG_SSD:
            from ..ops.photometric import device_color_aug_ssd

            model.device_augment = device_color_aug_ssd
        elif cfg.INPUT.COLOR_JITTER:
            from ..ops.photometric import device_color_jitter

            model.device_augment = device_color_jitter
    return model
