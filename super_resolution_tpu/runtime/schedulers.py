"""LR schedules as optax-compatible functions.

Reference semantics (ref: basicsr/models/lr_scheduler.py): MultiStepRestartLR
(:6-33) and CosineAnnealingRestartLR (:57-96), plus the linear warmup
multiplier BaseModel applies for warmup_iter (ref: base_model.py:181-202).
Expressed as pure iter->lr functions usable directly as optax schedules —
traceable (jnp ops) so they live inside the jitted train step.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp


def multistep_restart_lr(base_lr: float, milestones: Sequence[int],
                         gamma: float = 0.1,
                         restarts: Sequence[int] = (0,),
                         restart_weights: Sequence[float] = (1,)):
    """Step decay at milestones; LR resets (scaled by restart weight) at
    restart iters. Matching the reference's stateful scheduler
    (ref: lr_scheduler.py:27-33): a restart resets LR to initial_lr*weight,
    so milestones at or before the restart boundary stop contributing;
    duplicated milestones decay multiple times (Counter semantics)."""
    order = np.argsort(restarts)
    restarts = np.asarray(restarts)[order]
    weights = np.asarray(restart_weights, dtype=np.float64)[order]
    milestones = np.asarray(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step)
        # current restart boundary (0 when none passed yet) and its weight
        idx = jnp.clip(jnp.sum(step >= jnp.asarray(restarts)) - 1,
                       0, len(weights) - 1)
        boundary = jnp.asarray(restarts)[idx]
        w = jnp.asarray(weights)[idx]
        if len(milestones):
            m = jnp.asarray(milestones)
            n_decays = jnp.sum((step >= m) & (m > boundary))
        else:
            n_decays = 0
        return base_lr * w * (gamma ** n_decays)

    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0):
    """Cosine annealing with restarts (ref: lr_scheduler.py:57-96):
    within cycle i of length periods[i], lr = eta_min + w_i * 0.5 *
    (base - eta_min) * (1 + cos(pi * t_in_cycle / period_i))."""
    assert len(periods) == len(restart_weights)
    cum = np.concatenate([[0], np.cumsum(periods)])
    periods_arr = np.asarray(periods, dtype=np.float64)
    weights = np.asarray(restart_weights, dtype=np.float64)

    def schedule(step):
        step = jnp.asarray(step).astype(jnp.float32)
        # step == cum boundary belongs to the *ending* cycle (lr hits
        # eta_min there, matching the reference's <= comparison)
        idx = jnp.clip(jnp.sum(step > jnp.asarray(cum[1:])), 0, len(periods_arr) - 1)
        start = jnp.asarray(cum[:-1])[idx]
        period = jnp.asarray(periods_arr)[idx]
        w = jnp.asarray(weights)[idx]
        t = jnp.clip(step - start, 0, period)
        return eta_min + w * 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(jnp.pi * t / period))

    return schedule


def with_warmup(schedule, warmup_iter: int):
    """Linear warmup multiplier over the first warmup_iter steps
    (ref: base_model.py:181-202: lr scales by current_iter/warmup_iter)."""
    if warmup_iter <= 0:
        return schedule

    def warmed(step):
        lr = schedule(step)
        frac = jnp.clip((jnp.asarray(step).astype(jnp.float32) + 1) / warmup_iter,
                        0.0, 1.0)
        return lr * frac

    return warmed


def build_schedule(train_opt: dict):
    """Build from the reference scheduler YAML block (train.scheduler)."""
    sched_opt = dict(train_opt["scheduler"])
    sched_type = sched_opt.pop("type")
    base_lr = train_opt["optim_g"]["lr"]
    if sched_type in ("MultiStepLR", "MultiStepRestartLR"):
        schedule = multistep_restart_lr(base_lr, **sched_opt)
    elif sched_type == "CosineAnnealingRestartLR":
        schedule = cosine_annealing_restart_lr(base_lr, **sched_opt)
    else:
        raise ValueError(f"Unsupported scheduler: {sched_type}")
    return with_warmup(schedule, train_opt.get("warmup_iter", -1))
