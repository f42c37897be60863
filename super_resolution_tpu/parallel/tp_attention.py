"""Head-parallel fused window attention — TP composed with the Pallas
megakernels.

GSPMD cannot partition a pallas_call (no sharding rule), so Megatron
column-sharding the qkv weight would force an all-gather at every fused
attention. Attention has a better-than-Megatron parallel axis anyway: the
HEAD dimension. Under `shard_map` each device

  1. slices its head group's columns out of the (replicated) qkv weight —
     the q/k/v column blocks for heads [i*H/P, (i+1)*H/P) — and the
     matching rows of the out-projection,
  2. runs the unchanged fused MSA megakernel
     (ops/pallas_attention.py::fused_msa_block) on its slice: qkv
     projection, windowing, attention, and the row-parallel partial of the
     output projection all stay in VMEM,
  3. psums the proj partials over the model axis (the one collective
     Megatron row-parallelism requires).

Weights stay replicated (SR nets are <=40M params; TP's payoff here is
activation memory and step latency, see parallel/tp.py header), FLOPs and
the attention working set split P ways, and the kernel boundary needs no
resharding. Gradients flow via the kernel's custom VJP
(fused_msa_block_ad) composed with shard_map's transpose (slice -> pad,
psum -> identity, replicated-weight cotangents psummed).

Replaces: the reference's FlexAttention windows run single-GPU only
(ref: ESC/basicsr/archs/esc_arch.py:234-240; DDP replicates the net,
base_model.py:95-98).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def head_parallel_msa_block(x_img, w_qkv, b_qkv, w_proj, b_proj, bias,
                            mask, *, heads: int, window_size: int,
                            mesh: Mesh, axis: str = "model",
                            scale: float | None = None):
    """fused_msa_block with heads sharded over mesh[axis].

    Args match ops/pallas_attention.py::fused_msa_block; `heads` is the
    GLOBAL head count (must divide mesh.shape[axis]). The batch dim rides
    a 'data' axis when the mesh has one (the DP x TP rectangle). Output is
    identical to the unsharded fused block up to f32-psum reordering
    (pinned by tests/test_tp_attention.py).
    """
    from super_resolution_tpu.ops.pallas_attention import fused_msa_block_ad

    ntp = int(mesh.shape[axis])
    if heads % ntp:
        raise ValueError(f"{heads} heads do not divide mesh[{axis!r}] "
                         f"({ntp} devices)")
    c = x_img.shape[-1]
    d = c // heads
    hloc = heads // ntp
    c_loc = hloc * d
    if scale is None:
        scale = d ** -0.5
    data = "data" if "data" in mesh.shape else None
    xspec = P(data, *([None] * (x_img.ndim - 1)))
    rep = P()

    def worker(x, wqkv, bqkv, wproj, bproj, bias_, mask_):
        idx = jax.lax.axis_index(axis)
        col0 = idx * c_loc
        w_loc = jnp.concatenate(
            [jax.lax.dynamic_slice(wqkv, (0, g * c + col0), (c, c_loc))
             for g in range(3)], axis=1)                    # (C, 3*c_loc)
        b_loc = jnp.concatenate(
            [jax.lax.dynamic_slice(bqkv, (g * c + col0,), (c_loc,))
             for g in range(3)])                            # (3*c_loc,)
        bias_loc = jax.lax.dynamic_slice(
            bias_, (idx * hloc, 0, 0), (hloc,) + bias_.shape[1:])
        wp_loc = jax.lax.dynamic_slice(wproj, (col0, 0), (c_loc, c))
        partial = fused_msa_block_ad(
            x, w_loc, b_loc, wp_loc, jnp.zeros_like(bproj), bias_loc,
            mask_, hloc, window_size, scale)
        # row-parallel reduce; the proj bias is added ONCE, after the psum
        return jax.lax.psum(partial, axis) + bproj.astype(partial.dtype)

    # check_vma=False: pallas_call's out_shape carries no varying-axes
    # annotation, so the vma type system cannot see through it; grad
    # correctness (incl. the psummed replicated-weight cotangents) is
    # pinned by tests/test_tp_attention.py
    return jax.shard_map(
        worker, mesh=mesh,
        in_specs=(xspec, rep, rep, rep, rep, rep, rep),
        out_specs=xspec, check_vma=False,
    )(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask)


def head_parallel_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv,
                             b_kv, w_proj, b_proj, bias, *, heads: int,
                             window_size: int, overlap_win: int, mesh: Mesh,
                             axis: str = "model",
                             scale: float | None = None):
    """fused_ocab_block with heads sharded over mesh[axis].

    Args match ops/pallas_attention.py::fused_ocab_block; `heads` is the
    GLOBAL head count (must divide mesh.shape[axis]). Each device slices
    its head group's q columns, the matching k/v column pair out of the
    (C, 2C) kv weight, the proj rows and the bias heads, runs the fused
    OCAB kernel with residual_scale = 1/P, and psums; the proj bias is
    added once after the psum. LN runs full-C on every device (it must —
    the norm is over the whole channel dim)."""
    from super_resolution_tpu.ops.pallas_attention import \
        fused_ocab_block_scaled_ad

    ntp = int(mesh.shape[axis])
    if heads % ntp:
        raise ValueError(f"{heads} heads do not divide mesh[{axis!r}] "
                         f"({ntp} devices)")
    c = x_img.shape[-1]
    d = c // heads
    hloc = heads // ntp
    c_loc = hloc * d
    if scale is None:
        scale = d ** -0.5
    data = "data" if "data" in mesh.shape else None
    xspec = P(data, *([None] * (x_img.ndim - 1)))
    rep = P()

    def worker(x, lns, lnb, wq, bq, wkv, bkv, wproj, bproj, bias_):
        idx = jax.lax.axis_index(axis)
        col0 = idx * c_loc
        wq_loc = jax.lax.dynamic_slice(wq, (0, col0), (c, c_loc))
        bq_loc = jax.lax.dynamic_slice(bq, (col0,), (c_loc,))
        # k and v column blocks for this head group out of the (C, 2C)
        # fused kv weight
        wkv_loc = jnp.concatenate(
            [jax.lax.dynamic_slice(wkv, (0, g * c + col0), (c, c_loc))
             for g in range(2)], axis=1)                    # (C, 2*c_loc)
        bkv_loc = jnp.concatenate(
            [jax.lax.dynamic_slice(bkv, (g * c + col0,), (c_loc,))
             for g in range(2)])
        bias_loc = jax.lax.dynamic_slice(
            bias_, (idx * hloc, 0, 0), (hloc,) + bias_.shape[1:])
        wp_loc = jax.lax.dynamic_slice(wproj, (col0, 0), (c_loc, c))
        partial = fused_ocab_block_scaled_ad(
            x, lns, lnb, wq_loc, bq_loc, wkv_loc, bkv_loc, wp_loc,
            jnp.zeros_like(bproj), bias_loc, hloc, window_size,
            overlap_win, scale, 1.0 / ntp)
        return jax.lax.psum(partial, axis) + bproj.astype(partial.dtype)

    return jax.shard_map(
        worker, mesh=mesh,
        in_specs=(xspec, rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=xspec, check_vma=False,
    )(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv, w_proj, b_proj, bias)
