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


def split_stage_params(params: Any, names: Sequence[str]):
    """(stacked stage subtrees, rest-of-params) — the PP TrainState layout:
    `stacked` lives sharded P('pipe') so each device holds only its stage
    slice (params, grads, Adam moments), `rest` (head/tail) is replicated."""
    rest = {k: v for k, v in params.items() if k not in set(names)}
    return stack_stage_params(params, names), rest


def merge_stage_params(stacked: Any, rest: Any, names: Sequence[str]) -> Any:
    """Inverse of split_stage_params — back to the flax param tree (for
    checkpointing / the inference path)."""
    out = dict(rest)
    for i, n in enumerate(names):
        out[n] = jax.tree.map(lambda x: x[i], stacked)
    return out


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

    # only `axis` is manual; any other mesh axes (e.g. 'model') stay
    # automatic, so GSPMD partitions the per-stage math over them — this is
    # what makes the TP x PP composition work: stage params arrive sharded
    # (pipe, ..., model) and the XLA partitioner inserts the Megatron
    # collectives inside each tick while ppermute rides the manual pipe ring
    out = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(axis), P(*([None] * mbs.ndim))),
        out_specs=P(*([None] * mbs.ndim)),
        axis_names={axis})(stacked_params, mbs)
    return out.reshape(x.shape)


def pp_stage(net):
    """(stage module, stage param names, stage_apply) for pipelining the
    residual-group stack of a supported arch — one group module standing in
    for every group. Requires equal group configs (the flagships'
    (6,)*N qualify). Drop-path rates are stage-0's — stages are applied
    deterministically in the pipeline (drop-path is a regularizer, inactive
    both at inference and in PP training; see make_pp_train_step).

    Supported stacks (all shape-preserving token maps between a `head`
    split and a `tail` split on the arch):
      HAT / HATClassic  — RHAG        (ref: hat_arch.py:484-556)
      SwinIR            — RSTB        (ref: basicsr/archs/swinir_arch.py:480-567)
      SRFormer          — PSAGroup    (ref: hat/archs/srformer_arch.py groups)
      ATD               — ATDB        (ref: hat/archs/atd_arch.py:657-735;
                          each block owns its token dictionary param, so
                          blocks are self-contained stages)
    """
    import flax.linen as nn

    from super_resolution_tpu.models.hat_arch import HAT, RHAG
    from super_resolution_tpu.models.hat_classic_arch import (HATClassic,
                                                              RHAGClassic)

    if len(set(net.depths)) != 1 or len(set(net.num_heads)) != 1:
        raise ValueError("pipelining needs identical group configs; got "
                         f"depths={net.depths} heads={net.num_heads}")
    names = [f"layers_{i}" for i in range(len(net.depths))]
    dpr = np.linspace(0, getattr(net, "drop_path_rate", 0.0),
                      sum(net.depths)).tolist()

    def det_apply(stage):
        return lambda p, a: stage.apply({"params": p}, a, True)

    if type(net) is HATClassic or type(net) is HAT:
        common = dict(
            dim=net.embed_dim, depth=net.depths[0],
            num_heads=net.num_heads[0], window_size=net.window_size,
            compress_ratio=net.compress_ratio,
            squeeze_factor=net.squeeze_factor, conv_scale=net.conv_scale,
            overlap_ratio=net.overlap_ratio, mlp_ratio=net.mlp_ratio,
            drop_path_rates=tuple(dpr[:net.depths[0]]),
            resi_connection=net.resi_connection)
        if type(net) is HATClassic:
            stage = RHAGClassic(**common)
        else:
            cls = (nn.remat(RHAG, static_argnums=(2,)) if net.use_checkpoint
                   else RHAG)
            stage = cls(**common, esc_pdim=net.esc_pdim,
                        esc_kernel=net.esc_kernel,
                        ocab_esc_enable=net.ocab_esc_enable,
                        ocab_esc_pdim=net.ocab_esc_pdim,
                        ocab_esc_kernel=net.ocab_esc_kernel)
        return stage, names, det_apply(stage)

    from super_resolution_tpu.models.atd_arch import ATD, ATDB
    from super_resolution_tpu.models.srformer_arch import PSAGroup, SRFormer
    from super_resolution_tpu.models.swinir_arch import RSTB, SwinIR

    if type(net) is SwinIR:
        cls = (nn.remat(RSTB, static_argnums=(2,)) if net.use_checkpoint
               else RSTB)
        stage = cls(dim=net.embed_dim, depth=net.depths[0],
                    num_heads=net.num_heads[0],
                    window_size=net.window_size, mlp_ratio=net.mlp_ratio,
                    drop_path_rates=tuple(dpr[:net.depths[0]]),
                    resi_connection=net.resi_connection)
        return stage, names, det_apply(stage)
    if type(net) is SRFormer:
        cls = (nn.remat(PSAGroup, static_argnums=(2,)) if net.use_checkpoint
               else PSAGroup)
        stage = cls(dim=net.embed_dim, depth=net.depths[0],
                    num_heads=net.num_heads[0],
                    window_size=net.window_size, mlp_ratio=net.mlp_ratio,
                    drop_path_rates=tuple(dpr[:net.depths[0]]),
                    resi_connection=net.resi_connection)
        return stage, names, det_apply(stage)
    if type(net) is ATD:
        cls = nn.remat(ATDB) if net.use_checkpoint else ATDB
        stage = cls(dim=net.embed_dim, depth=net.depths[0],
                    num_heads=net.num_heads[0],
                    window_size=net.window_size,
                    category_size=net.category_size,
                    num_tokens=net.num_tokens,
                    reducted_dim=net.reducted_dim,
                    convffn_kernel_size=net.convffn_kernel_size,
                    mlp_ratio=net.mlp_ratio,
                    resi_connection=net.resi_connection)
        return stage, names, lambda p, a: stage.apply({"params": p}, a)
    raise NotImplementedError(
        f"pipeline stages for {type(net).__name__}; HAT/HATClassic/SwinIR/"
        "SRFormer/ATD group stacks are supported")


def hat_classic_stage(net):
    """Back-compat shim: (stage module, stage param names)."""
    stage, names, _ = pp_stage(net)
    return stage, names


def pipeline_forward(net, params: Any, x: jnp.ndarray,
                     mesh: Mesh, axis: str = "pipe",
                     microbatches: int | None = None):
    """Whole-model pipelined inference: replicated head and tail (tiny —
    two convs + LN), residual-group stack pipelined over mesh[axis]. Works
    for every arch pp_stage supports."""
    _, names, stage_apply = pp_stage(net)
    stacked = stack_stage_params(params, names)
    feat, body = net.apply({"params": params}, x, method="head")
    body = pipeline_apply(stage_apply, stacked, body, mesh, axis=axis,
                          microbatches=microbatches)
    return net.apply({"params": params}, body, feat, method="tail")


# historical name (r3) — the forward was generalized beyond HATClassic
hat_classic_pipeline_forward = pipeline_forward


def init_pp_params(net, params: Any, mesh: Mesh, axis: str = "pipe",
                   tp_axis: str | None = None):
    """Split + device_put the flax param tree into the PP layout:
    {'stages': stacked stage slices sharded P(axis) (each pipe device holds
    only its chunk), 'rest': head/tail replicated over the mesh}.

    tp_axis: also shard the transformer matmuls of each stage slice over
    this mesh axis with the Megatron column/row layout (parallel/tp.py
    rules, shifted one dim right for the leading stage axis) — the TP x PP
    composition. pipeline_apply keeps non-pipe axes automatic, so GSPMD
    inserts the TP collectives inside each pipeline tick."""
    _, names, _ = pp_stage(net)
    stacked, rest = split_stage_params(params, names)
    from jax.sharding import NamedSharding

    if tp_axis is None:
        stacked = jax.tree.map(
            lambda v: jax.device_put(v, NamedSharding(
                mesh, P(axis, *([None] * (v.ndim - 1))))), stacked)
    else:
        import types

        from super_resolution_tpu.parallel.tp import _divisible, tp_spec

        def put(path, v):
            # evaluate the TP rule on the per-stage view (dims 1:) then
            # prepend the pipe axis
            view = types.SimpleNamespace(ndim=v.ndim - 1, shape=v.shape[1:])
            spec = _divisible(tp_spec(path, view, tp_axis), view, mesh,
                              tp_axis)
            return jax.device_put(v, NamedSharding(mesh, P(axis, *spec)))

        stacked = jax.tree_util.tree_map_with_path(put, stacked)
    rest = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), rest)
    return {"stages": stacked, "rest": rest}


def merge_pp_params(net, pp_params: Any) -> Any:
    """PP layout -> plain flax param tree (replicated): for checkpoints and
    the (non-pipelined) inference path."""
    _, names, _ = pp_stage(net)
    return merge_stage_params(pp_params["stages"], pp_params["rest"], names)


def make_hat_pp_train_step(net, tx, train_opt: dict, mesh: Mesh,
                           axis: str = "pipe",
                           microbatches: int | None = None):
    """GPipe TRAINING step over mesh[axis] — same contract as
    make_sr_train_step: f(state, batch, rng) -> (state, logs), where
    state.params is the init_pp_params layout.

    The backward pass is reverse-mode THROUGH the pipelined forward:
    transposing the tick scan replays the schedule in reverse, ppermute
    transposes to the inverse ring permutation (activations' cotangents
    flow device i+1 -> i), and the scan-carry cotangent accumulates each
    device's stage-slice gradient across its microbatches — exactly
    GPipe's microbatch gradient accumulation, derived by autodiff instead
    of hand-scheduled. One optimizer update per step; stage params, grads
    and Adam moments all live sharded P(axis), so per-device optimizer
    memory is S/P stages (the point of PP).

    Drop-path runs inactive inside the pipelined stack (stacked stages
    share one module; per-stage stochastic-depth rates don't stack).
    Pinned against the plain DP step at ~1e-5 by
    tests/test_pipeline_parallel.py::test_pp_train_step_matches_plain.

    Replaces: the reference trains only under DDP replication
    (ref: basicsr/models/base_model.py:95-98)."""
    import optax

    from super_resolution_tpu.losses import build_loss
    from super_resolution_tpu.runtime.train_loop import TrainState

    cri_pix = build_loss(train_opt["pixel_opt"])
    ema_decay = train_opt.get("ema_decay", 0)
    use_amp = bool(train_opt.get("use_amp", False))
    _, _, stage_apply = pp_stage(net)

    def loss_fn(pp_params, batch):
        rest, stages = pp_params["rest"], pp_params["stages"]
        lq = batch["lq"]
        if use_amp:
            cast = lambda v: (v.astype(jnp.bfloat16)  # noqa: E731
                              if jnp.issubdtype(v.dtype, jnp.floating) else v)
            rest = jax.tree.map(cast, rest)
            stages = jax.tree.map(cast, stages)
            lq = lq.astype(jnp.bfloat16)
        feat, body = net.apply({"params": rest}, lq, method="head")
        body = pipeline_apply(stage_apply, stages, body, mesh, axis=axis,
                              microbatches=microbatches)
        sr = net.apply({"params": rest}, body, feat,
                       method="tail").astype(jnp.float32)
        l_pix = cri_pix(sr, batch["gt"])
        return l_pix, {"l_pix": l_pix}

    def train_step(state: TrainState, batch, rng):
        del rng  # drop-path inactive in the pipelined stack
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                state.ema_params, params)
        else:
            ema = state.ema_params
        return TrainState(step=state.step + 1, params=params,
                          ema_params=ema, opt_state=opt_state), logs

    return train_step


# historical name (r4) — the train step was generalized beyond HAT
make_pp_train_step = make_hat_pp_train_step
