"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference scales with DDP/NCCL (ref: basicsr/models/base_model.py:95-98,
basicsr/utils/dist_util.py); the TPU-native equivalent is a
`jax.sharding.Mesh` with named axes and NamedSharding annotations — XLA
inserts the gradient psum/all-gathers over ICI (SURVEY.md §2.7).

Axes:
  'data'  — batch / tile axis (DP and the multi-chip tiled-inference axis)

SR models are <=40M params and fit on one chip, so parameters are
replicated and only the batch axis is sharded (the analog of DDP). The
helpers are written against arbitrary mesh shapes so a 'model' axis can be
added when a future arch needs TP.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """1-D (default) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) == 1:
        arr = arr.reshape(-1)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/tile) dim; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch pytree with the batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_multiple(batch: Any, multiple: int):
    """Pad the batch dim so it divides the mesh (edge batches in eval).
    Returns (padded_batch, original_size)."""
    import numpy as np

    def leading(x):
        return x.shape[0]

    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    padded = jax.tree.map(
        lambda x: np.concatenate([x, np.repeat(x[-1:], pad, axis=0)]), batch)
    return padded, n
