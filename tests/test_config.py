"""Config system tests (semantics from reference tests/test_config.py)."""

import os
import tempfile

import pytest

from detectron2_centernet_tpu.config import CfgNode, configurable, get_cfg


def test_defaults_present():
    cfg = get_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert cfg.MODEL.CENTERNET.DOWN_RATIO == 4
    assert cfg.MODEL.CENTERNET.TASK.HM == 80
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.TEST.BATCH_SIZE == 1  # fork-added key


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.MODEL.META_ARCHITECTURE = "X"
    cfg.defrost()
    cfg.MODEL.META_ARCHITECTURE = "X"
    assert cfg.MODEL.META_ARCHITECTURE == "X"


def test_clone_is_independent():
    cfg = get_cfg()
    cfg.freeze()
    c2 = cfg.clone()
    assert not c2.is_frozen()
    c2.MODEL.MASK_ON = True
    assert cfg.MODEL.MASK_ON is False


def test_merge_from_list():
    cfg = get_cfg()
    cfg.merge_from_list(["MODEL.MASK_ON", "True", "SOLVER.BASE_LR", "0.02"])
    assert cfg.MODEL.MASK_ON is True
    assert cfg.SOLVER.BASE_LR == 0.02
    with pytest.raises(KeyError):
        cfg.merge_from_list(["MODEL.DOES_NOT_EXIST", "1"])


def test_type_coercion():
    cfg = get_cfg()
    # int into float slot is allowed
    cfg.merge_from_list(["SOLVER.BASE_LR", "1"])
    assert cfg.SOLVER.BASE_LR == 1.0 and isinstance(cfg.SOLVER.BASE_LR, float)
    # list into tuple slot is allowed
    cfg.merge_from_list(["SOLVER.STEPS", "[100, 200]"])
    assert cfg.SOLVER.STEPS == (100, 200)
    # string into int slot is not
    with pytest.raises(ValueError):
        cfg.merge_from_list(["SOLVER.MAX_ITER", "'abc'"])


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "MODEL:\n  META_ARCHITECTURE: CenterNet\n  CENTERNET:\n    DOWN_RATIO: 4\n"
    )
    child = tmp_path / "child.yaml"
    child.write_text(
        '_BASE_: "./base.yaml"\nMODEL:\n  CENTERNET:\n    HEAD_CONV: 128\nVERSION: 2\n'
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.META_ARCHITECTURE == "CenterNet"
    assert cfg.MODEL.CENTERNET.HEAD_CONV == 128
    assert cfg.MODEL.CENTERNET.DOWN_RATIO == 4


def test_load_reference_ctdet_config():
    """The fork's own ctdet config must merge without modification."""
    path = "/root/reference/projects/CenterNet/configs/COCO-Detection/ctdet_dla_34_1x.yaml"
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    cfg = get_cfg()
    cfg.merge_from_file(path)
    assert cfg.MODEL.META_ARCHITECTURE == "CenterNet"
    assert cfg.MODEL.BACKBONE.NAME == "build_dla34_backbone"
    assert cfg.MODEL.PIXEL_MEAN == [0.408, 0.447, 0.470]
    assert cfg.MODEL.CENTERNET.FOCAL_LOSS_ALPHA == [1]
    assert cfg.SOLVER.MAX_ITER == 265000


def test_dump_roundtrip(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    f = tmp_path / "dumped.yaml"
    f.write_text(cfg.dump())
    cfg2 = get_cfg()
    cfg2.merge_from_file(str(f))
    assert cfg2.MODEL.MASK_ON is True


def test_configurable():
    class Model:
        @configurable
        def __init__(self, depth, width=1):
            self.depth = depth
            self.width = width

        @classmethod
        def from_config(cls, cfg):
            return {"depth": cfg.MODEL.RESNETS.DEPTH}

    cfg = get_cfg()
    m1 = Model(cfg)
    assert m1.depth == 50 and m1.width == 1
    m2 = Model(cfg, width=3)
    assert m2.depth == 50 and m2.width == 3
    m3 = Model(depth=18)
    assert m3.depth == 18


def test_every_repo_config_merges():
    """Every YAML under configs/ (incl. the 28 quick_schedules ported from
    the reference) must merge into get_cfg() cleanly."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "**", "*.yaml"), recursive=True))
    assert len(files) >= 100, len(files)
    for f in files:
        cfg = get_cfg()
        cfg.merge_from_file(f)  # raises on unknown keys / broken _BASE_
    # the quick_schedules acceptance harness is fully populated
    qs = [f for f in files if "quick_schedules" in f]
    assert len(qs) >= 28, len(qs)
