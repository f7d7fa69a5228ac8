from .checkpointer import Checkpointer, DetectionCheckpointer, PeriodicCheckpointer
from .torch_import import align_state_dicts, convert_torch_tensor, load_torch_state_dict

__all__ = [
    "Checkpointer",
    "DetectionCheckpointer",
    "PeriodicCheckpointer",
    "align_state_dicts",
    "convert_torch_tensor",
    "load_torch_state_dict",
]
