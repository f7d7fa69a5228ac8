"""Every projects/*/configs YAML must merge cleanly and point at registered
components (the reference ships 6 projects; all 6 exist here)."""

import glob
import os

import pytest

from detectron2_centernet_tpu.config import get_cfg

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "projects")

_EXTRA_CFG = {
    "DensePose": ("densepose_tpu", "add_densepose_config"),
    "TensorMask": ("tensormask_tpu", "add_tensormask_config"),
}


def _all_yamls():
    out = []
    for proj in sorted(os.listdir(_ROOT)):
        for y in sorted(
            glob.glob(os.path.join(_ROOT, proj, "configs", "**", "*.yaml"),
                      recursive=True)
        ):
            out.append((proj, y))
    return out


def test_six_projects_present():
    projects = {p for p in os.listdir(_ROOT) if os.path.isdir(os.path.join(_ROOT, p))}
    assert {
        "CenterNet", "DeepLab", "DensePose", "PointRend", "TensorMask",
        "TridentNet",
    } <= projects


@pytest.mark.parametrize("proj,path", _all_yamls())
def test_project_config_merges(proj, path):
    import sys

    cfg = get_cfg()
    if proj in _EXTRA_CFG:
        mod_name, fn_name = _EXTRA_CFG[proj]
        sys.path.insert(0, os.path.join(_ROOT, proj))
        try:
            mod = __import__(mod_name)
            getattr(mod, fn_name)(cfg)
        finally:
            sys.path.pop(0)
    cfg.merge_from_file(path)
    cfg.freeze()
    # the named backbone/meta-arch must exist in the registries
    from detectron2_centernet_tpu.models.registry import (
        BACKBONE_REGISTRY,
        META_ARCH_REGISTRY,
    )

    BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)
    arch = cfg.MODEL.META_ARCHITECTURE
    if arch == "GeneralizedRCNN" and cfg.MODEL.ROI_HEADS.NAME == "RROIHeads":
        arch = "RotatedRCNN"
    META_ARCH_REGISTRY.get(arch)
