"""Device mesh construction and sharding helpers.

The reference's only parallelism is data parallel via one-process-per-GPU DDP
(SURVEY.md §2.4; engine/launch.py:24-94, engine/defaults.py:280-284).  The
TPU-native replacement is SPMD: one ``jax.sharding.Mesh`` over all devices
with a ``data`` axis; the batch is sharded over that axis with a
``NamedSharding`` and XLA inserts the gradient ``psum`` (the DDP allreduce)
and the global BatchNorm reductions automatically.

``get_mesh`` is the single entry point; everything that needs a mesh —
train_step pjit, prediction, NaiveSyncBN-equivalent stats — goes through it so
single-chip and N-chip runs share one code path (axis size 1 collapses every
collective to a no-op, mirroring the reference's world_size==1 shortcuts,
comm.py:139-151).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(num_devices: int = -1, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices in (-1, 0):
        num_devices = len(devices)
    assert num_devices <= len(devices), (num_devices, len(devices))
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Move a host batch (pytree of arrays, leading dim = batch) onto the mesh
    sharded along ``axis_name``."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Mesh) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def global_mesh() -> Mesh:
    global _GLOBAL_MESH
    if _GLOBAL_MESH is None:
        _GLOBAL_MESH = get_mesh()
    return _GLOBAL_MESH
