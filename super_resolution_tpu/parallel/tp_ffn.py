"""Hidden-parallel fused MLP tails — TP composed with the Pallas FFN
kernels (the FFN analog of parallel/tp_attention.py).

GSPMD cannot partition a pallas_call, so Megatron column/row-sharding the
fc1/fc2 weights forces the fused MLP route off under TP (the XLA path then
contracts them sharded). The better composition keeps the weights
replicated and shards the HIDDEN dimension inside a `shard_map`: each
device

  1. slices its hidden-column block out of fc1 (and the matching fc2
     rows / fc1-bias slice),
  2. runs the unchanged fused kernel (ops/pallas_ffn.py::mlp_block /
     mlp_block_sum3) on its slice with `residual_scale = 1/P`, so the
     LayerNorm (full C, replicated compute — <1% of tail FLOPs) and its
     slice of the two matmuls stay in VMEM,
  3. psums the partials over the model axis — residual and MLP partials
     reassemble exactly; the fc2 bias is added ONCE after the psum.

FLOPs and the hidden activations (the MLP's entire working set) split P
ways; the kernel boundary needs no resharding. Gradients flow via the
kernels' custom VJPs (mlp_block*_scaled_ad) composed with shard_map's
transpose, pinned by tests/test_tp_ffn.py.

Replaces: the reference runs its MLP tails single-GPU under DDP
(ref: hat/archs/hat_arch.py:236-237, basicsr/models/base_model.py:95-98).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _check_hidden(hid: int, mesh: Mesh, axis: str) -> int:
    ntp = int(mesh.shape[axis])
    if hid % ntp:
        raise ValueError(f"hidden dim {hid} does not divide mesh[{axis!r}] "
                         f"({ntp} devices)")
    return ntp


def hidden_parallel_mlp_block(x, gamma, beta, w1, b1, w2, b2, *,
                              mesh: Mesh, axis: str = "model"):
    """mlp_block (x + MLP(LN(x))) with the hidden dim sharded over
    mesh[axis]. Args match ops/pallas_ffn.py::mlp_block; weights are
    replicated globals (sliced per device inside). The batch dim rides a
    'data' axis when the mesh has one."""
    from super_resolution_tpu.ops.pallas_ffn import mlp_block_scaled_ad

    hid = w1.shape[1]
    ntp = _check_hidden(hid, mesh, axis)
    c = x.shape[-1]
    hloc = hid // ntp
    data = "data" if "data" in mesh.shape else None
    xspec = P(data, *([None] * (x.ndim - 1)))
    rep = P()

    def worker(x_, gam, bet, w1_, b1_, w2_, b2_):
        idx = jax.lax.axis_index(axis)
        h0 = idx * hloc
        w1l = jax.lax.dynamic_slice(w1_, (0, h0), (c, hloc))
        b1l = jax.lax.dynamic_slice(b1_, (h0,), (hloc,))
        w2l = jax.lax.dynamic_slice(w2_, (h0, 0), (hloc, c))
        partial = mlp_block_scaled_ad(x_, gam, bet, w1l, b1l, w2l,
                                      jnp.zeros_like(b2_), 1.0 / ntp)
        # fc2 bias added ONCE, after the psum
        return jax.lax.psum(partial, axis) + b2_.astype(partial.dtype)

    # check_vma=False: pallas_call's out_shape carries no varying-axes
    # annotation (same caveat as parallel/tp_attention.py); grad
    # correctness is pinned by tests/test_tp_ffn.py
    return jax.shard_map(
        worker, mesh=mesh,
        in_specs=(xspec, rep, rep, rep, rep, rep, rep),
        out_specs=xspec, check_vma=False,
    )(x, gamma, beta, w1, b1, w2, b2)


def hidden_parallel_mlp_sum3(shortcut, attn_x, conv_x, gamma, beta, w1, b1,
                             w2, b2, *, conv_scale: float, mesh: Mesh,
                             axis: str = "model"):
    """mlp_block_sum3 (3-way residual + MLP tail) with the hidden dim
    sharded over mesh[axis]. The 3-way sum feeds the LayerNorm on every
    device (it must — LN is over the full channel dim); only its residual
    contribution is scaled by 1/P so the psum adds it back once."""
    from super_resolution_tpu.ops.pallas_ffn import mlp_block_sum3_scaled_ad

    hid = w1.shape[1]
    ntp = _check_hidden(hid, mesh, axis)
    c = shortcut.shape[-1]
    hloc = hid // ntp
    data = "data" if "data" in mesh.shape else None
    xspec = P(data, *([None] * (shortcut.ndim - 1)))
    rep = P()

    def worker(s, a, cv, gam, bet, w1_, b1_, w2_, b2_):
        idx = jax.lax.axis_index(axis)
        h0 = idx * hloc
        w1l = jax.lax.dynamic_slice(w1_, (0, h0), (c, hloc))
        b1l = jax.lax.dynamic_slice(b1_, (h0,), (hloc,))
        w2l = jax.lax.dynamic_slice(w2_, (h0, 0), (hloc, c))
        partial = mlp_block_sum3_scaled_ad(
            s, a, cv, gam, bet, w1l, b1l, w2l, jnp.zeros_like(b2_),
            conv_scale, 1.0 / ntp)
        return jax.lax.psum(partial, axis) + b2_.astype(partial.dtype)

    return jax.shard_map(
        worker, mesh=mesh,
        in_specs=(xspec, xspec, xspec, rep, rep, rep, rep, rep, rep),
        out_specs=xspec, check_vma=False,
    )(shortcut, attn_x, conv_x, gamma, beta, w1, b1, w2, b2)
