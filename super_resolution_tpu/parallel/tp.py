"""Tensor parallelism for the window-transformer family (Megatron layout).

The reference has no TP — it scales with DDP only (ref:
basicsr/models/base_model.py:95-98) because its models fit one GPU. On TPU
the same models still fit one chip, but TP is the axis that shrinks
*activation* memory and step latency when the global batch can't grow
(e.g. GAN recipes pinned at batch 8/chip), and it is the idiomatic way to
ride ICI: annotate parameter shardings, let GSPMD insert the collectives
(scaling-book recipe), never hand-write them.

Layout (Megatron-LM): column-parallel first matmul, row-parallel second —
  qkv/kernel  (C, 3C)   -> P(None, 'model')   activations become
  fc1/kernel  (C, kC)   -> P(None, 'model')   feature-sharded, the
  qkv/bias, fc1/bias    -> P('model')         elementwise nonlinearity
  proj/kernel (C, C)    -> P('model', None)   stays local, and the second
  fc2/kernel  (kC, C)   -> P('model', None)   matmul contracts the sharded
  proj/bias, fc2/bias   -> P()                dim (XLA inserts one
                                              reduce-scatter/all-reduce
                                              pair per block).
Convolutions (CAB, shallow/tail convs) and norms are replicated: they are
<10% of block FLOPs and channel-sharded convs would reshard at every
window<->image boundary.

NOTE: the fused Pallas megakernels consume whole weight matrices inside
one pallas_call and carry no GSPMD partitioning rule, so TP runs use the
pure-XLA attention path (SR_TPU_ATTN=xla); `shard_params_tp` asserts this.

Expert parallelism has no target in this framework: the reference has no
MoE layer (ATD's token dictionary is a shared learned basis, not routed
experts — ref: atd_arch.py:249-335), so there is deliberately no 'expert'
axis.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names whose Dense kernels are column-parallel (out dim sharded) /
# row-parallel (in dim sharded). Covers HAT/HATClassic/HATX/SwinIR/
# SRFormer/HiT-SRF/ATD/ESC blocks: attention in-projections + Mlp fc1 /
# attention out-projections + Mlp fc2 (timm naming), ATD's wq/wk/wv +
# mlp_0/mlp_2, SRFormer's linear1/linear2 ConvFFN pair.
_COL_PARALLEL = frozenset({"qkv", "q", "kv", "q_proj", "kv_proj", "wqkv",
                           "wq", "wk", "wv", "fc1", "mlp_0", "linear1"})
_ROW_PARALLEL = frozenset({"proj", "fc2", "mlp_2", "linear2"})


def _path_names(path) -> list[str]:
    return [str(getattr(k, "key", k)) for k in path]


def tp_spec(path, leaf, axis: str = "model") -> P:
    """PartitionSpec for one parameter under the Megatron layout above."""
    names = _path_names(path)
    if len(names) < 2:
        return P()
    module, param = names[-2], names[-1]
    if module in _COL_PARALLEL:
        if param == "kernel" and leaf.ndim == 2:
            return P(None, axis)
        if param == "bias" and leaf.ndim == 1:
            return P(axis)
    if module in _ROW_PARALLEL and param == "kernel" and leaf.ndim == 2:
        return P(axis, None)
    return P()


def tp_param_specs(params: Any, axis: str = "model") -> Any:
    """Pytree of PartitionSpecs matching `params` (replicated where the
    Megatron rules don't apply)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: tp_spec(path, leaf, axis), params)


def _divisible(spec: P, leaf, mesh: Mesh, axis: str) -> P:
    """Drop the sharding where the dim doesn't divide the axis size
    (e.g. a 1-head tiny net on an 8-way model axis) — replicated is always
    correct; GSPMD requires divisibility only for the explicit annotation."""
    n = mesh.shape[axis]
    for d, name in enumerate(spec):
        if name == axis and leaf.shape[d] % n != 0:
            return P()
    return spec


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put `params` with the TP layout over `mesh[axis]`.

    Returns the sharded pytree; all non-matching params replicated over the
    whole mesh (so a ('data','model') mesh sees DP-replicated, TP-sharded
    weights — the standard DP x TP rectangle)."""
    if os.environ.get("SR_TPU_ATTN", "").lower() == "pallas":
        raise RuntimeError(
            "TP shards the qkv/proj weights across chips; the fused Pallas "
            "attention kernels need them whole in VMEM. Unset SR_TPU_ATTN "
            "or set it to 'xla' for TP runs.")

    def put(path, leaf):
        spec = _divisible(tp_spec(path, leaf, axis), leaf, mesh, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def tp_sharded_fraction(params: Any, axis: str = "model") -> float:
    """Fraction of parameter bytes the TP layout actually shards —
    a layout sanity probe (flagship HAT ~2/3 of transformer-block bytes)."""
    total = sharded = 0

    def visit(path, leaf):
        nonlocal total, sharded
        nbytes = np.prod(leaf.shape) * leaf.dtype.itemsize if leaf.ndim else 0
        total += nbytes
        if tuple(tp_spec(path, leaf, axis)) != ():
            sharded += nbytes

    jax.tree_util.tree_map_with_path(visit, params)
    return sharded / max(total, 1)
