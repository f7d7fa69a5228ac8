"""Model zoo accessor tests (reference tests/test_model_zoo.py analog)."""

import pytest

from detectron2_centernet_tpu import model_zoo
from detectron2_centernet_tpu.model_zoo.model_zoo import _MODEL_URLS


def test_table_is_complete():
    # every released-artifact row from the reference table must be present
    assert len(_MODEL_URLS) == 50


@pytest.mark.parametrize("config_path", sorted(_MODEL_URLS))
def test_zoo_entry(config_path):
    url = model_zoo.get_checkpoint_url(config_path)
    assert url.startswith("https://dl.fbaipublicfiles.com/detectron2/")
    assert url.endswith(".pkl")
    assert config_path.replace(".yaml", "") in url
    # the config file must exist locally and merge into a valid cfg
    cfg = model_zoo.get_config(config_path)
    assert cfg.MODEL.META_ARCHITECTURE


def test_unknown_path_raises():
    with pytest.raises(RuntimeError):
        model_zoo.get_checkpoint_url("COCO-Detection/does_not_exist.yaml")
    with pytest.raises(RuntimeError):
        model_zoo.get_config_file("COCO-Detection/does_not_exist.yaml")
