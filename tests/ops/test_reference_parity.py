"""Bit-level parity against the reference implementation.

Loads the reference's numpy-only target-generation functions
(``gaussian_radius`` / ``gaussian2D`` / ``draw_umich_gaussian`` from
``/root/reference/detectron2/data/detection_utils.py``) directly from their
source at TEST time and checks our vectorized on-device implementation
produces identical heatmaps — SURVEY.md §7 hard part #3 (exact mAP parity
depends on these bit-level behaviors).  Skipped when the reference tree
isn't mounted.
"""

import ast
import math
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from detectron2_centernet_tpu.ops.target_gen import (  # noqa: E402
    gaussian_radius,
    gen_centernet_targets,
)

_REF = "/root/reference/detectron2/data/detection_utils.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference tree not mounted"
)


def _load_reference_fns():
    """Extract the three pure-numpy functions from the reference source."""
    with open(_REF) as f:
        tree = ast.parse(f.read())
    wanted = {"gaussian_radius", "gaussian2D", "draw_umich_gaussian"}
    mod = ast.Module(
        body=[
            n for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name in wanted
        ],
        type_ignores=[],
    )
    ns = {"np": np, "math": math}
    exec(compile(mod, _REF, "exec"), ns)  # noqa: S102 — test-only, local file
    assert wanted <= set(ns), set(ns)
    return ns


def test_gaussian_radius_parity():
    ref = _load_reference_fns()["gaussian_radius"]
    rng = np.random.RandomState(0)
    hs = np.ceil(rng.rand(200) * 60 + 0.5)
    ws = np.ceil(rng.rand(200) * 60 + 0.5)
    ours = np.asarray(gaussian_radius(jnp.asarray(hs), jnp.asarray(ws)))
    for h, w, r in zip(hs, ws, ours):
        np.testing.assert_allclose(r, ref((h, w)), rtol=1e-5, atol=1e-5)


def test_heatmap_parity_with_reference_stamping():
    """Full per-image heatmap: our vectorized render == the reference's
    per-object draw_umich_gaussian loop (same radius/int-cast conventions)."""
    ns = _load_reference_fns()
    draw = ns["draw_umich_gaussian"]
    ref_radius = ns["gaussian_radius"]

    rng = np.random.RandomState(7)
    out_h = out_w = 32
    num_classes = 4
    m = 12
    boxes = rng.rand(m, 4) * 100
    boxes[:, 2:] = boxes[:, :2] + rng.rand(m, 2) * 60 + 4
    classes = rng.randint(0, num_classes, m)

    # --- reference path (per-object loop, output-map coords = boxes / 4)
    hm_ref = np.zeros((num_classes, out_h, out_w), np.float32)
    for i in range(m):
        b = boxes[i] / 4.0
        h, w = b[3] - b[1], b[2] - b[0]
        ct = np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2], np.float32)
        ct_int = ct.astype(np.int32)
        if not (0 <= ct_int[0] < out_w and 0 <= ct_int[1] < out_h):
            continue
        radius = max(0, int(ref_radius((math.ceil(h), math.ceil(w)))))
        draw(hm_ref[classes[i]], ct_int, radius)

    # --- our vectorized path
    valid = np.array(
        [
            0 <= int((b[0] + b[2]) / 8) < out_w and 0 <= int((b[1] + b[3]) / 8) < out_h
            for b in boxes
        ]
    )
    t = gen_centernet_targets(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(classes, jnp.int32),
        jnp.asarray(valid),
        num_classes,
        out_h,
        out_w,
        4,
    )
    hm_ours = np.transpose(np.asarray(t["hm"]), (2, 0, 1))
    np.testing.assert_allclose(hm_ours, hm_ref, atol=1e-5)
