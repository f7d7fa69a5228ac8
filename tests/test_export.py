"""StableHLO export round trip + analysis utilities."""

import numpy as np
import pytest
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


@pytest.mark.slow
def test_int8_ptq_inference_acc(tmp_path):
    """Inference-acc pin for the int8 PTQ path: train a tiny CenterNet to
    mastery on a one-rectangle synthetic task, then require the int8
    quantize->dequantize weights to hold AP within a small delta of f32
    (the reference pins TensorRT/Caffe2 deployment accuracy the same way,
    dev/run_inference_tests.sh; measured full-task delta recorded in
    PARITY.md deviations)."""
    from detectron2_centernet_tpu.data import DatasetCatalog, MetadataCatalog
    from detectron2_centernet_tpu.engine import DefaultTrainer
    from detectron2_centernet_tpu.export import (
        dequantize_variables,
        quantize_variables,
    )

    rng = np.random.RandomState(7)
    def load():
        dicts = []
        for i in range(16):
            img = np.zeros((64, 64, 3), np.uint8)
            x, y = int(rng.randint(4, 38)), int(rng.randint(4, 42))
            img[y : y + 16, x : x + 20, 0] = 255
            dicts.append({
                "image": img, "height": 64, "width": 64, "image_id": i,
                "file_name": f"q{i}.png",
                "annotations": [{
                    "bbox": [float(x), float(y), 20.0, 16.0],
                    "bbox_mode": 1, "category_id": 0, "iscrowd": 0,
                }],
            })
        return dicts

    name = "_int8_synth"
    DatasetCatalog.register(name, load)
    MetadataCatalog.get(name).set(thing_classes=["obj"])
    try:
        cfg = get_cfg()
        cfg.DATASETS.TRAIN = (name,)
        cfg.DATASETS.TEST = (name,)
        cfg.MODEL.META_ARCHITECTURE = "CenterNet"
        cfg.MODEL.BACKBONE.NAME = "build_dla34_backbone"
        cfg.MODEL.CENTERNET.LEVELS = [1, 1, 1, 1, 1, 1]
        cfg.MODEL.CENTERNET.CHANNELS = [4, 8, 8, 16, 16, 16]
        cfg.MODEL.CENTERNET.HEAD_CONV = 8
        cfg.MODEL.CENTERNET.MAX_OBJS = 4
        cfg.MODEL.CENTERNET.SCORE_THRESH_TEST = 0.25
        cfg.INPUT.TRAIN_SIZE = (64, 64)
        cfg.INPUT.TEST_SIZE = (64, 64)
        cfg.TPU.DTYPE = "float32"
        cfg.SOLVER.OPTIMIZER = "ADAM"
        cfg.SOLVER.IMS_PER_BATCH = 8
        cfg.SOLVER.MAX_ITER = 400
        cfg.SOLVER.BASE_LR = 2e-3
        cfg.SOLVER.STEPS = (320,)
        cfg.SOLVER.WARMUP_ITERS = 20
        cfg.SOLVER.CHECKPOINT_PERIOD = 100000
        cfg.TEST.BATCH_SIZE = 8
        cfg.DATALOADER.NUM_WORKERS = 1
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.freeze()

        trainer = DefaultTrainer(cfg)
        trainer.resume_or_load(resume=False)
        trainer.train()
        ap_f32 = DefaultTrainer.test(cfg, trainer)["bbox"]["AP"]

        model = trainer.model
        model.variables = dequantize_variables(
            quantize_variables({
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            })
        )
        ap_int8 = DefaultTrainer.test(cfg, model)["bbox"]["AP"]
    finally:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)

    assert ap_f32 > 40.0, f"f32 baseline did not learn the task: {ap_f32}"
    assert ap_int8 >= ap_f32 - 5.0, (ap_f32, ap_int8)
