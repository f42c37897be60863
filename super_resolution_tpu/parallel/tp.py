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

The fused Pallas megakernels compose with TP via HEAD parallelism
(parallel/tp_attention.py): while `tp_attention(mesh)` is active, the
window-attention modules route through a shard_map in which each device
slices its head group's qkv columns / proj rows out of the (replicated)
weights and runs the fused kernel on its slice; the row-parallel proj
partials psum over 'model'. The fused MLP tails compose via HIDDEN
parallelism the same way (parallel/tp_ffn.py: fc1-column / fc2-row slices
of replicated weights, residual scaled 1/P, one psum). The remaining fused
routes (OCAB attention, gated-dconv FFN, other archs) fall back to XLA
under TP (tp_active()) so GSPMD shards their Megatron-laid-out weights.

Expert parallelism has no target in this framework: the reference has no
MoE layer (ATD's token dictionary is a shared learned basis, not routed
experts — ref: atd_arch.py:249-335), so there is deliberately no 'expert'
axis.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Active while a TP model is being TRACED (jit tracing happens inside the
# step/forward call, so wrapping the call covers it): window-attention
# modules route their fused-kernel path head-parallel over the mesh, and
# the fused FFN/OCAB routes yield to XLA+GSPMD. A contextvar instead of a
# process-global (or the old SR_TPU_ATTN=xla env mutation) so one TP model
# cannot leak routing into later models in the same process.
_TP_ATTN_CTX: contextvars.ContextVar = contextvars.ContextVar(
    "sr_tpu_tp_attention", default=None)


@contextlib.contextmanager
def tp_attention(mesh: Mesh | None, axis: str = "model"):
    """Route fused window attention head-parallel over mesh[axis] for
    traces performed inside this context (no-op if mesh is None)."""
    token = _TP_ATTN_CTX.set(None if mesh is None else (mesh, axis))
    try:
        yield
    finally:
        _TP_ATTN_CTX.reset(token)


def tp_attention_ctx():
    """(mesh, axis) while inside tp_attention, else None."""
    return _TP_ATTN_CTX.get()


def tp_active() -> bool:
    return _TP_ATTN_CTX.get() is not None

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


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model",
                    head_parallel_attn: bool = False,
                    hidden_parallel_mlp: bool = False) -> Any:
    """device_put `params` with the TP layout over `mesh[axis]`.

    Returns the sharded pytree; all non-matching params replicated over the
    whole mesh (so a ('data','model') mesh sees DP-replicated, TP-sharded
    weights — the standard DP x TP rectangle).

    head_parallel_attn: keep the window-MSA in/out projections
    (`.../attn/{qkv,proj}`) replicated — the head-parallel fused-kernel
    route (parallel/tp_attention.py) slices them per device inside its
    shard_map, so a GSPMD column/row sharding would only force an
    all-gather at the shard_map boundary.

    hidden_parallel_mlp: likewise keep the Mlp fc1/fc2 weights replicated —
    the hidden-parallel fused-FFN route (parallel/tp_ffn.py) slices the
    hidden dim per device inside its shard_map."""

    def put(path, leaf):
        names = _path_names(path)
        if head_parallel_attn and len(names) >= 3 and (
                names[-3] in ("attn", "overlap_attn")):
            spec = P()
        elif hidden_parallel_mlp and len(names) >= 2 and (
                (len(names) >= 3 and names[-3] == "mlp")
                or names[-2] in ("mlp_0", "mlp_2")):
            spec = P()
        else:
            spec = _divisible(tp_spec(path, leaf, axis), leaf, mesh, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def mlp_hidden_divisible(params: Any, ntp: int) -> bool:
    """True when every fused-routable MLP hidden dim (mlp/fc1 or mlp_0
    kernels) divides ntp — the gate for the hidden-parallel fused-FFN
    composition (parallel/tp_ffn.py). False when the tree has none."""
    found = ok = True

    def visit(path, leaf):
        nonlocal found, ok
        names = _path_names(path)
        if names[-1] != "kernel" or leaf.ndim != 2:
            return
        if ((len(names) >= 3 and names[-3] == "mlp" and names[-2] == "fc1")
                or names[-2] == "mlp_0"):
            found = True
            if leaf.shape[1] % ntp:
                ok = False

    found = False
    jax.tree_util.tree_map_with_path(visit, params)
    return found and ok


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


def match_param_layout(opt_state, params):
    """device_put optimizer-state subtrees that mirror the params tree
    (optax moments are ``zeros_like(params)``) onto the params' shardings.

    Under jit, fresh zeros have no sharding-propagation source, so GSPMD
    is free to emit them replicated — ``init_train_state`` under a TP/PP
    mesh otherwise produces replicated Adam moments and silently forfeits
    the optimizer-state sharding (r4; caught by
    tests/test_tp.py::test_tp_resume_reapplies_sharding). Leaves that do
    not sit in a params-shaped subtree (step counts, schedule state) pass
    through untouched.
    """
    pstruct = jax.tree.structure(params)

    def mirrors_params(node):
        if node is opt_state:
            return False
        try:
            return jax.tree.structure(node) == pstruct
        except Exception:  # noqa: BLE001 - non-pytree nodes
            return False

    def fix(node):
        if not mirrors_params(node):
            return node
        return jax.tree.map(
            lambda o, p: jax.device_put(o, p.sharding)
            if hasattr(p, "sharding") and getattr(o, "shape", None) == p.shape
            else o,
            node, params)

    return jax.tree.map(fix, opt_state, is_leaf=mirrors_params)
