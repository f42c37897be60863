"""Functional training core: TrainState, optimizer factory, jitted steps.

Replaces the reference's stateful BaseModel training machinery
(ref: basicsr/models/base_model.py — optimizer factory :103-120, EMA
:75-82, schedulers :122-133; sr_model.py optimize_parameters :92-119) with
one pure train-step function over an explicit TrainState. The step jits
once and runs under a Mesh with the batch axis sharded (data parallelism:
XLA inserts the gradient psum the reference got from DDP allreduce).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import optax

import jax
import jax.numpy as jnp

from super_resolution_tpu.losses import build_loss
from super_resolution_tpu.runtime.schedulers import build_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def build_optimizer(train_opt: dict):
    """optax transform from the reference optim_g block
    (ref: base_model.py:103-120; 7 optimizer types — the ones SR configs
    actually use are mapped, the rest raise)."""
    opt = dict(train_opt["optim_g"])
    opt_type = opt.pop("type")
    schedule = build_schedule(train_opt)
    betas = opt.pop("betas", (0.9, 0.999))
    weight_decay = opt.pop("weight_decay", 0.0)
    opt.pop("lr", None)

    if opt_type == "Adam":
        if weight_decay:
            tx = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                             weight_decay=weight_decay)
        else:
            tx = optax.adam(schedule, b1=betas[0], b2=betas[1])
    elif opt_type == "AdamW":
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                         weight_decay=weight_decay)
    elif opt_type == "SGD":
        tx = optax.sgd(schedule, momentum=opt.pop("momentum", 0.0))
    else:
        raise NotImplementedError(f"optimizer {opt_type}")

    clip = train_opt.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule


def build_pixel_criterion(train_opt: dict) -> Callable | None:
    if train_opt.get("pixel_opt"):
        return build_loss(train_opt["pixel_opt"])
    return None


def init_train_state(params, tx, ema_decay: float = 0.0) -> TrainState:
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      ema_params=ema, opt_state=tx.init(params))


def make_sr_train_step(net, tx, train_opt: dict):
    """Single-net SR train step (L1-family pixel loss, EMA).

    Returns f(state, batch, rng) -> (state, logs); pure and jittable.
    batch: {'lq': (B,h,w,3), 'gt': (B,H,W,3)} NHWC float32.
    """
    import inspect

    cri_pix = build_pixel_criterion(train_opt)
    if cri_pix is None:
        raise ValueError("train.pixel_opt is required for the SR step")
    ema_decay = train_opt.get("ema_decay", 0)
    takes_det = "deterministic" in inspect.signature(net.__call__).parameters

    def loss_fn(params, batch, rng):
        kwargs = {"deterministic": False} if takes_det else {}
        sr = net.apply({"params": params}, batch["lq"],
                       rngs={"droppath": rng}, **kwargs)
        l_pix = cri_pix(sr, batch["gt"])
        return l_pix, {"l_pix": l_pix}

    def train_step(state: TrainState, batch, rng):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            ema = jax.tree.map(lambda e, p: e * ema_decay + p * (1 - ema_decay),
                               state.ema_params, params)
        else:
            ema = state.ema_params
        new_state = TrainState(step=state.step + 1, params=params,
                               ema_params=ema, opt_state=opt_state)
        return new_state, logs

    return train_step
