from .centernet import CenterNet, CenterNetModel, focal_loss, reg_l1_loss

__all__ = ["CenterNet", "CenterNetModel", "focal_loss", "reg_l1_loss"]
