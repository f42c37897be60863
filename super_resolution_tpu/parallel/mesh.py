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


def make_mesh_from_spec(spec: dict, devices=None) -> Mesh:
    """Mesh from a YAML ``mesh:`` block — ordered {axis: size}; one axis
    may be -1 (fill with the remaining devices). E.g.
    ``mesh: {data: -1}`` (pure DP) or ``mesh: {data: 4, model: 2}``
    (DP x TP rectangle; parallel/tp.py shards the transformer matmuls
    over 'model')."""
    if devices is None:
        devices = jax.devices()
    sizes = dict(spec)
    fills = [a for a, s in sizes.items() if s == -1]
    if len(fills) > 1:
        raise ValueError(f"mesh spec {spec}: only one axis may be -1")
    fixed = int(np.prod([s for s in sizes.values() if s != -1]))
    if fills:
        if len(devices) % fixed:
            raise ValueError(f"mesh spec {spec} does not divide "
                             f"{len(devices)} devices")
        sizes[fills[0]] = len(devices) // fixed
    n = int(np.prod(list(sizes.values())))
    if n > len(devices):
        raise ValueError(f"mesh spec {spec} needs {n} devices, "
                         f"found {len(devices)}")
    if n < len(devices):
        # an explicit undersized spec silently idling chips is almost
        # always a config bug — use -1 to fill the slice
        from super_resolution_tpu.utils.logger import get_root_logger

        get_root_logger().warning(
            f"mesh spec {spec} covers {n} of {len(devices)} devices; "
            f"{len(devices) - n} chips will sit idle (use -1 on one axis "
            f"to fill the slice)")
    arr = np.asarray(devices[:n]).reshape(tuple(sizes.values()))
    return Mesh(arr, tuple(sizes))


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


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Multi-host initialization — the dist_util analog
    (ref: basicsr/utils/dist_util.py:10-57: NCCL init from env or Slurm).

    On TPU pods jax.distributed.initialize() autodetects everything; env
    overrides (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID)
    mirror the reference's RANK/WORLD_SIZE plumbing. Returns
    (process_index, process_count); a no-op single-process fallback when
    no multi-host environment is detected.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") \
            or os.environ.get("TPU_WORKER_HOSTNAMES"):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes or _env_int("JAX_NUM_PROCESSES"),
                process_id=process_id or _env_int("JAX_PROCESS_ID"))
        except RuntimeError:
            pass  # already initialized
    return jax.process_index(), jax.process_count()


def _env_int(name: str):
    import os

    v = os.environ.get(name)
    return int(v) if v is not None else None


def all_sum_across_processes(values: dict) -> dict:
    """Sum a dict of python floats across processes (metric reduction for
    process-sharded validation — SURVEY.md §5.8: the reference computes
    validation on rank 0 only; sharding eval over hosts is a pure win)."""
    if jax.process_count() == 1:
        return dict(values)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(values)
    local = np.asarray([values[k] for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(local)
    summed = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}
