from .dla import DLA34, DLATrunk, DLAUp, IDAUp, build_dla34_backbone

__all__ = ["DLA34", "DLATrunk", "DLAUp", "IDAUp", "build_dla34_backbone"]
