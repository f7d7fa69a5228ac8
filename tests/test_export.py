"""StableHLO export round trip + analysis utilities."""

import numpy as np
import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.config import get_cfg
from detectron2_centernet_tpu.export import export_stablehlo, load_exported
from detectron2_centernet_tpu.models import build_model
from detectron2_centernet_tpu.utils.analysis import (
    flop_count,
    parameter_count,
    parameter_count_table,
)


def _tiny_centernet():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_dla34_backbone"
    cfg.MODEL.CENTERNET.TASK.HM = 3
    cfg.MODEL.CENTERNET.LEVELS = [1, 1, 1, 1, 1, 1]
    cfg.MODEL.CENTERNET.CHANNELS = [4, 8, 8, 16, 16, 16]
    cfg.MODEL.CENTERNET.HEAD_CONV = 8
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (64, 64))
    return model, variables


def test_export_round_trip(tmp_path):
    model, variables = _tiny_centernet()
    path = str(tmp_path / "model.stablehlo")
    blob = export_stablehlo(model, variables, batch_size=2, image_size=(64, 64), path=path)
    assert len(blob) > 1000

    served = load_exported(path)
    images = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 255
    out = served(images)
    direct = model.predict_fn(variables, jnp.asarray(images))
    for k in ("boxes", "scores", "classes"):
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(direct[k]), atol=1e-4
        )


def test_parameter_count():
    model, variables = _tiny_centernet()
    counts = parameter_count(variables["params"])
    assert counts[""] > 1000
    table = parameter_count_table(variables["params"])
    assert "model" in table

    flops = flop_count(
        lambda im: model.predict_fn(variables, im), jnp.zeros((1, 64, 64, 3))
    )
    assert flops is None or flops > 0


def test_int8_weight_quantization_roundtrip_and_error():
    """Weight-only int8 PTQ: round-trip shape/dtype integrity and a bounded
    end-to-end output deviation (the TensorRT-int8-engine analog)."""
    import jax
    import numpy as np

    from detectron2_centernet_tpu.export import (
        dequantize_variables,
        quantization_error,
        quantize_variables,
    )

    model, variables = _tiny_centernet()
    packed = quantize_variables(variables)
    deq = dequantize_variables(packed)
    # structure preserved
    a = jax.tree_util.tree_structure(variables)
    b = jax.tree_util.tree_structure(deq)
    assert a == b
    # at least one kernel actually quantized
    leaves = jax.tree_util.tree_flatten_with_path(packed["tree"])[0]
    n_q = sum(
        1 for _, l in leaves
        if isinstance(l, np.ndarray) and l.dtype == np.int8
    )
    assert n_q > 0
    imgs = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255
    err = quantization_error(model, variables, imgs)
    assert err["output_max_rel_err"] < 0.08, err


def test_activation_calibration():
    import numpy as np

    from detectron2_centernet_tpu.export import calibrate_activations

    model, variables = _tiny_centernet()
    imgs = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32) * 255
    ranges = calibrate_activations(model, variables, imgs)
    assert len(ranges) > 5
    assert all(v >= 0 for v in ranges.values())


def test_export_model_cli(tmp_path):
    """tools/export_model.py: config+weights -> artifact -> reload ->
    smoke-run (the reference tools/deploy/caffe2_converter.py role)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "export")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools", "export_model.py"),
            "--output", out, "--batch-size", "1", "--image-size", "64", "64",
            "--run-smoke",
            "MODEL.META_ARCHITECTURE", "CenterNet",
            "MODEL.BACKBONE.NAME", "build_dla34_backbone",
            "MODEL.CENTERNET.TASK.HM", "3",
            "MODEL.CENTERNET.LEVELS", "[1,1,1,1,1,1]",
            "MODEL.CENTERNET.CHANNELS", "[4,8,8,16,16,16]",
            "MODEL.CENTERNET.HEAD_CONV", "8",
            "TPU.DTYPE", "float32",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    assert os.path.exists(os.path.join(out, "export_meta.json"))
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert "Smoke run OK" in r.stderr + r.stdout
