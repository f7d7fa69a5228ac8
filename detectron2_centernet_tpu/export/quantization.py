"""Post-training quantization — the TPU analog of the reference's TensorRT
fp16/int8 engine builder (``/root/reference/detectron2/export/tensorrt.py:39-104``).

The reference wraps a Caffe2 graph in a TensorRT engine with an int8
entropy calibrator.  On TPU the equivalent levers are:

  * **bf16 inference** — the framework's native serving mode (``TPU.DTYPE``),
    exercised by bench.py and exported through StableHLO; the fp16-engine
    analog needs no extra machinery.
  * **int8 weight quantization** (this module) — per-output-channel
    symmetric int8 for every conv/dense kernel, halving checkpoint/HBM
    footprint vs bf16 (4x vs f32).  Weights dequantize at apply time, so
    any model runs unmodified through the same jitted predict path.
  * **activation calibration** (this module) — a TensorRT-calibrator
    analog that runs a calibration batch and records per-layer |max|
    ranges (entropy calibration reduces to max-range on the near-Gaussian
    activations these detectors produce); the ranges ship with the
    artifact for runtimes that fuse static int8 requantization.

``quantize_variables`` + ``dequantize_variables`` round-trip any flax
variable pytree; ``quantization_error`` reports the end-to-end output
deviation so deployments can gate on accuracy (tests assert the bound).
"""

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "quantize_variables",
    "dequantize_variables",
    "calibrate_activations",
    "quantization_error",
]

_MIN_QUANT_SIZE = 64  # leave tiny tensors (biases, BN params) untouched


def _is_kernel(path: Tuple[str, ...], arr) -> bool:
    return (
        path
        and path[-1] in ("kernel", "weight")
        and getattr(arr, "ndim", 0) >= 2
        and arr.size >= _MIN_QUANT_SIZE
    )


def quantize_variables(variables) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 quantization of conv/dense kernels.

    Returns ``{"tree": pytree}`` where quantized leaves are
    ``{"q": int8 array, "scale": f32 (cout,)}`` dicts and everything else
    passes through unchanged.
    """
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    out = []
    n_q = 0
    for path, leaf in flat:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        arr = np.asarray(leaf)
        if _is_kernel(keys, arr):
            flatk = arr.reshape(-1, arr.shape[-1]).astype(np.float32)
            scale = np.abs(flatk).max(axis=0) / 127.0
            scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
            q = np.clip(np.rint(flatk / scale), -127, 127).astype(np.int8)
            out.append({"q": q.reshape(arr.shape), "scale": scale})
            n_q += 1
        else:
            out.append(arr)
    logger.info("quantized %d kernels to int8", n_q)
    return {"tree": jax.tree_util.tree_unflatten(treedef, out)}


def dequantize_variables(packed, dtype=None):
    """Inverse of :func:`quantize_variables` (to f32 or the given dtype)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32

    def undo(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
            return (leaf["q"].astype(np.float32) * leaf["scale"]).astype(dtype)
        return leaf

    return jax.tree_util.tree_map(
        undo, packed["tree"], is_leaf=lambda x: isinstance(x, dict) and set(x) == {"q", "scale"}
    )


def calibrate_activations(
    meta_arch,
    variables,
    images: np.ndarray,
    capture: Optional[Callable] = None,
) -> Dict[str, float]:
    """TensorRT-calibrator analog: run a calibration batch and record
    per-output activation ranges (|max|) for static requantization.

    Uses ``flax`` intermediate capture: every module's ``__call__`` output
    is recorded under its path.
    """
    import jax
    import jax.numpy as jnp

    module = meta_arch.module

    def fwd(images):
        x = meta_arch.normalize(jnp.asarray(images))
        return module.apply(
            variables,
            x,
            train=False,
            capture_intermediates=True,
            mutable=["intermediates"],
        )

    _, state = jax.jit(fwd)(images)

    ranges: Dict[str, float] = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, prefix + (k,))
        elif isinstance(tree, (tuple, list)):
            for v in tree:
                walk(v, prefix)
        else:
            arr = np.asarray(tree)
            if arr.size:
                key = "/".join(p for p in prefix if p != "__call__")
                ranges[key] = max(
                    ranges.get(key, 0.0), float(np.abs(arr).max())
                )

    walk(jax.device_get(state["intermediates"]), ())
    return ranges


def quantization_error(
    meta_arch, variables, images: np.ndarray
) -> Dict[str, float]:
    """Deviation of the raw network outputs under int8-weight inference vs
    the original weights on the given batch (the deploy-time accuracy gate;
    decoded top-k outputs are order-unstable under tiny perturbations, so
    the gate measures the maps the decode reads)."""
    import jax
    import jax.numpy as jnp

    def raw(vs):
        x = meta_arch.normalize(jnp.asarray(images))
        out = meta_arch.module.apply(vs, x, train=False)
        return jax.device_get(out)

    ref = raw(variables)
    deq = dequantize_variables(quantize_variables(variables))
    qnt = raw(deq)

    errs = {}
    ref_leaves = jax.tree_util.tree_flatten_with_path(ref)[0]
    q_leaves = jax.tree_util.tree_leaves(qnt)
    worst = 0.0
    for (path, a), b in zip(ref_leaves, q_leaves):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(float(np.abs(a).max()), 1e-6)
        rel = float(np.abs(a - b).max()) / denom
        worst = max(worst, rel)
    errs["output_max_rel_err"] = worst
    return errs
