"""Model export / deployment.

The reference's export stack (``detectron2/export/``: Caffe2 tracing, ONNX
graph surgery, TensorRT engines — ~3.9k LoC of protobuf plumbing) exists
because PyTorch graphs need translation to reach deployment runtimes.  The
TPU-native equivalent is ``jax.export``: the jitted predict step serializes
to portable StableHLO bytes that any PJRT runtime (TPU serving, CPU, GPU)
can load and execute without Python — so the whole capability collapses to
two functions:

  ``export_stablehlo(meta_arch, variables, batch_size, image_size, path)``
  ``load_exported(path) -> ExportedModel`` (callable on numpy images)

Weights are baked into the serialized computation as constants (the
Caffe2Model.save analog of shipping one artifact).
"""

import logging
import os
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def export_stablehlo(
    meta_arch,
    variables,
    batch_size: int = 1,
    image_size: Tuple[int, int] = (512, 512),
    path: Optional[str] = None,
) -> bytes:
    """Serialize ``meta_arch.predict_fn(variables, images)`` to StableHLO.

    Returns the serialized bytes; writes to ``path`` if given.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = image_size

    def fn(images):
        return meta_arch.predict_fn(variables, images)

    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
        logger.info("Exported %d-byte StableHLO artifact to %s", len(blob), path)
    return blob


class ExportedModel:
    """Callable wrapper over a deserialized artifact."""

    def __init__(self, exported) -> None:
        self._exported = exported

    def __call__(self, images: np.ndarray):
        return self._exported.call(images)

    @property
    def in_avals(self):
        return self._exported.in_avals


def load_exported(path_or_bytes) -> ExportedModel:
    from jax import export as jexport

    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    else:
        blob = path_or_bytes
    return ExportedModel(jexport.deserialize(blob))
