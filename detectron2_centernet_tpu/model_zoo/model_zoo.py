"""Model zoo accessors (reference ``detectron2/model_zoo/model_zoo.py:11-120``).

Maps config paths to the in-repo ``configs/`` tree and (for the reference's
pretrained torch checkpoints) to their published URLs, which the checkpoint
subsystem can import via the torch-weight aligner.  This environment has no
network egress, so ``get(trained=True)`` requires the weight file to already
exist locally (pass ``weights_path``).
"""

import os
from typing import Optional

from ..config import CfgNode, get_cfg

_CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "configs")

# config path -> reference model zoo URL (detectron2 release artifacts)
_MODEL_URLS = {
    "COCO-Detection/faster_rcnn_R_50_FPN_1x.yaml":
        "https://dl.fbaipublicfiles.com/detectron2/COCO-Detection/faster_rcnn_R_50_FPN_1x/137257794/model_final_b275ba.pkl",
    "COCO-Detection/retinanet_R_50_FPN_1x.yaml":
        "https://dl.fbaipublicfiles.com/detectron2/COCO-Detection/retinanet_R_50_FPN_1x/190397773/model_final_bfca0b.pkl",
}


def get_config_file(config_path: str) -> str:
    path = os.path.abspath(os.path.join(_CONFIG_ROOT, config_path))
    if not os.path.exists(path):
        raise RuntimeError(f"{config_path} not available in configs/!")
    return path


def get_checkpoint_url(config_path: str) -> str:
    if config_path not in _MODEL_URLS:
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return _MODEL_URLS[config_path]


def get_config(config_path: str) -> CfgNode:
    cfg = get_cfg()
    cfg.merge_from_file(get_config_file(config_path), allow_unsafe=True)
    return cfg


def get(config_path: str, trained: bool = False, weights_path: Optional[str] = None):
    """Build the model for a zoo config (reference :78-120). With
    ``trained=True`` a local ``weights_path`` must point at the downloaded
    reference checkpoint (no egress in this environment)."""
    from ..checkpoint import DetectionCheckpointer
    from ..models import build_model

    cfg = get_config(config_path)
    model = build_model(cfg)
    if trained:
        import jax

        variables = model.init(jax.random.PRNGKey(0), tuple(cfg.INPUT.TEST_SIZE))
        src = weights_path or get_checkpoint_url(config_path)
        if not os.path.exists(src):
            raise FileNotFoundError(
                f"trained=True needs a local checkpoint; download "
                f"{get_checkpoint_url(config_path)} and pass weights_path"
            )
        variables = DetectionCheckpointer(variables).load(src)
        model.variables = variables
    return model
