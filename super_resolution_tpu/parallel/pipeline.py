"""Pipeline parallelism over the residual-group stack (GPipe on ICI).

The deep middle of every arch in this framework is a stack of
structurally identical, shape-preserving stages — HAT/HATClassic/SwinIR
RHAGs, SRFormer/HiT-SRF groups — i.e. exactly the layout pipeline
parallelism wants: stack the stage params on a leading axis, give each
device a contiguous chunk, and stream microbatches through the ring with
`jax.lax.ppermute` (the scaling-book pipelining recipe; the reference has
no analog — DDP replicates the whole net, basicsr/models/base_model.py:
95-98).

Schedule: plain GPipe. M microbatches, P pipe devices, M + P - 1 ticks;
device i applies its stage chunk to microbatch (t - i) at tick t and
passes the activation to device i+1. Bubble fraction (P-1)/(M+P-1).
Inference-exact: drop-path is inactive (deterministic), so stacking the
per-stage configs loses nothing.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(params: Any, names: Sequence[str]) -> Any:
    """Stack structurally identical subtrees params[name] on a new leading
    axis (stage-major). Raises if structures differ (e.g. HAT configs with
    unequal per-group depths cannot be pipelined this way)."""
    subtrees = [params[n] for n in names]
    treedefs = {jax.tree_util.tree_structure(t) for t in subtrees}
    if len(treedefs) != 1:
        raise ValueError(
            "pipeline stages must be structurally identical; got "
            f"{len(treedefs)} distinct param structures across {names}")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *subtrees)


def pipeline_apply(stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
                   stacked_params: Any, x: jnp.ndarray, mesh: Mesh,
                   axis: str = "pipe", microbatches: int | None = None):
    """Run x through S stacked stages pipelined over mesh[axis].

    stage_fn(stage_params, a) -> a' with a'.shape == a.shape (one stage,
      params = one leading-axis slice of stacked_params).
    stacked_params: leaves shaped (S, ...); S % mesh.shape[axis] == 0 —
      each device scans its S/P consecutive stages per tick.
    x: (B, ...) activations; B % microbatches == 0 (default: one
      microbatch per pipe device, the smallest count that fills the ring).

    Semantically identical to a serial scan over the S stages (pinned by
    tests/test_pipeline_parallel.py); the result is replicated.
    """
    npipe = int(mesh.shape[axis])
    s_total = jax.tree.leaves(stacked_params)[0].shape[0]
    if s_total % npipe:
        raise ValueError(f"{s_total} stages don't divide {npipe} pipe devices")
    if npipe == 1:
        out, _ = jax.lax.scan(
            lambda a, p: (stage_fn(p, a), None), x, stacked_params)
        return out
    m = microbatches or min(npipe, x.shape[0])
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} must divide microbatches {m}")
    mbs = x.reshape(m, x.shape[0] // m, *x.shape[1:])

    def worker(params_local, mbs_rep):
        idx = jax.lax.axis_index(axis)

        def chain(a):
            out, _ = jax.lax.scan(
                lambda c, p: (stage_fn(p, c), None), a, params_local)
            return out

        perm = [(i, (i + 1) % npipe) for i in range(npipe)]
        # mark the carries device-varying over the pipe axis up front
        # (shard_map's type system otherwise rejects the scan: the ticks
        # produce pipe-varying values from the replicated-zeros carry)
        state = jax.lax.pcast(jnp.zeros_like(mbs_rep[0]), (axis,),
                              to="varying")
        outbuf = jax.lax.pcast(jnp.zeros_like(mbs_rep), (axis,),
                               to="varying")

        def tick(carry, t):
            state, outbuf = carry
            inject = jax.lax.dynamic_index_in_dim(
                mbs_rep, jnp.minimum(t, m - 1), 0, keepdims=False)
            state = jnp.where(idx == 0, inject, state)
            y = chain(state)
            # device P-1 owns finished microbatch t-(P-1)
            slot = jnp.clip(t - (npipe - 1), 0, m - 1)
            valid = (t >= npipe - 1) & (idx == npipe - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, slot, 0,
                                               keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, y, cur), slot, 0)
            state = jax.lax.ppermute(y, axis, perm)
            return (state, outbuf), None

        (_, outbuf), _ = jax.lax.scan(
            tick, (state, outbuf), jnp.arange(m + npipe - 1))
        # only the last device's buffer is real; replicate via psum
        outbuf = jnp.where(idx == npipe - 1, outbuf, 0)
        return jax.lax.psum(outbuf, axis)

    out = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(axis), P(*([None] * mbs.ndim))),
        out_specs=P(*([None] * mbs.ndim)))(stacked_params, mbs)
    return out.reshape(x.shape)


def hat_classic_pipeline_forward(net, params: Any, x: jnp.ndarray,
                                 mesh: Mesh, axis: str = "pipe",
                                 microbatches: int | None = None):
    """Whole-model pipelined inference for HATClassic: replicated head and
    tail (tiny — two convs + LN), RHAG stack pipelined over mesh[axis].

    Requires equal depths per group (the flagship's (6,)*6 qualifies)."""
    from super_resolution_tpu.models.hat_classic_arch import RHAGClassic

    if len(set(net.depths)) != 1 or len(set(net.num_heads)) != 1:
        raise ValueError("pipelining needs identical RHAG configs; got "
                         f"depths={net.depths} heads={net.num_heads}")
    names = [f"layers_{i}" for i in range(len(net.depths))]
    stacked = stack_stage_params(params, names)
    dpr = np.linspace(0, net.drop_path_rate, sum(net.depths)).tolist()
    stage = RHAGClassic(
        dim=net.embed_dim, depth=net.depths[0], num_heads=net.num_heads[0],
        window_size=net.window_size, compress_ratio=net.compress_ratio,
        squeeze_factor=net.squeeze_factor, conv_scale=net.conv_scale,
        overlap_ratio=net.overlap_ratio, mlp_ratio=net.mlp_ratio,
        # inference-only: drop-path is identity under deterministic=True,
        # so stage-0 rates stand in for every stage's
        drop_path_rates=tuple(dpr[:net.depths[0]]),
        resi_connection=net.resi_connection)

    feat, body = net.apply({"params": params}, x, method="head")
    body = pipeline_apply(
        lambda p, a: stage.apply({"params": p}, a, True),
        stacked, body, mesh, axis=axis, microbatches=microbatches)
    return net.apply({"params": params}, body, feat, method="tail")
