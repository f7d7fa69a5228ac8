"""Config version migration (reference tests/test_config.py upgrade paths)."""

from detectron2_centernet_tpu.config import CfgNode, get_cfg, upgrade_config


def test_upgrade_v1_renames():
    old = CfgNode(
        {
            "VERSION": 1,
            "MODEL": {"WEIGHT": "/path/x.pkl", "ROI_HEADS": {"SCORE_THRESH": 0.1}},
            "TEST": {"AUG_ON": True, "AUG_FLIP": False},
        }
    )
    new = upgrade_config(old)
    assert new.VERSION == 2
    assert new.MODEL.WEIGHTS == "/path/x.pkl"
    assert new.MODEL.ROI_HEADS.SCORE_THRESH_TEST == 0.1
    assert new.TEST.AUG.ENABLED is True
    assert new.TEST.AUG.FLIP is False
    assert "WEIGHT" not in new.MODEL


def test_merge_v1_file(tmp_path):
    f = tmp_path / "old.yaml"
    f.write_text("VERSION: 1\nMODEL:\n  WEIGHT: 'w.pkl'\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.WEIGHTS == "w.pkl"
