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


def _path_contains(path, needles) -> bool:
    joined = "/".join(str(getattr(k, "key", k)) for k in path)
    return any(n in joined for n in needles)


def build_optimizer(train_opt: dict, lr_mult_rules: dict | None = None):
    """optax transform from the reference optim_g block
    (ref: base_model.py:103-120; 7 optimizer types — the ones SR configs
    actually use are mapped, the rest raise).

    lr_mult_rules: {substring: multiplier} — parameters whose tree path
    contains the substring get lr * multiplier (the reference's per-group
    lr, e.g. EDVR dcn_lr_mul / BasicVSR flow_lr_mul — edvr_model.py:19-46,
    video_recurrent_model.py:22-48)."""
    opt = dict(train_opt["optim_g"])
    opt_type = opt.pop("type")
    schedule = build_schedule(train_opt)
    betas = opt.pop("betas", (0.9, 0.999))
    weight_decay = opt.pop("weight_decay", 0.0)
    opt.pop("lr", None)

    def make_tx(scale: float):
        sched = (schedule if scale == 1.0
                 else (lambda step: schedule(step) * scale))
        if opt_type == "Adam":
            if weight_decay:
                return optax.adamw(sched, b1=betas[0], b2=betas[1],
                                   weight_decay=weight_decay)
            return optax.adam(sched, b1=betas[0], b2=betas[1])
        if opt_type == "AdamW":
            return optax.adamw(sched, b1=betas[0], b2=betas[1],
                               weight_decay=weight_decay)
        if opt_type == "SGD":
            return optax.sgd(sched, momentum=dict(opt).pop("momentum", 0.0))
        raise NotImplementedError(f"optimizer {opt_type}")

    if lr_mult_rules:
        rules = dict(lr_mult_rules)

        def label_fn(params):
            def label(path, _):
                for needle in rules:
                    if _path_contains(path, (needle,)):
                        return needle
                return "default"
            return jax.tree_util.tree_map_with_path(label, params)

        txs = {needle: make_tx(mult) for needle, mult in rules.items()}
        txs["default"] = make_tx(1.0)
        tx = optax.multi_transform(txs, label_fn)
    else:
        tx = make_tx(1.0)

    clip = train_opt.get("grad_clip_norm")
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule


def make_freeze_mask(freeze_rules: list | None):
    """freeze_rules: [(needles, until_iter)] — gradients of params whose
    path contains any needle are zeroed while step < until_iter; an
    until_iter of None freezes matching params FOREVER unless they match an
    'only' rule. Entries of the form ('only', needles, until_iter) freeze
    everything EXCEPT the needles until until_iter (EDVR's TSA-only phase,
    ref: edvr_model.py:48-61)."""
    if not freeze_rules:
        return None

    def mask(grads, step):
        def apply(path, g):
            scale = jnp.ones((), g.dtype)
            for rule in freeze_rules:
                if rule[0] == "only":
                    _, needles, until = rule
                    if not _path_contains(path, needles):
                        scale = scale * (step >= until).astype(g.dtype)
                else:
                    needles, until = rule
                    if _path_contains(path, needles):
                        scale = scale * (step >= until).astype(g.dtype)
            return g * scale
        return jax.tree_util.tree_map_with_path(apply, grads)

    return mask


def build_pixel_criterion(train_opt: dict) -> Callable | None:
    if train_opt.get("pixel_opt"):
        return build_loss(train_opt["pixel_opt"])
    return None


def init_train_state(params, tx, ema_decay: float = 0.0) -> TrainState:
    ema = jax.tree.map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      ema_params=ema, opt_state=tx.init(params))


def make_sr_train_step(net, tx, train_opt: dict, grad_mask=None):
    """Single-net SR train step (L1-family pixel loss, EMA).

    Returns f(state, batch, rng) -> (state, logs); pure and jittable.
    batch: {'lq': (B,h,w,3), 'gt': (B,H,W,3)} NHWC float32.
    grad_mask: optional f(grads, step) -> grads (staged freezing).
    """
    import inspect

    cri_pix = build_pixel_criterion(train_opt)
    if cri_pix is None:
        raise ValueError("train.pixel_opt is required for the SR step")
    ema_decay = train_opt.get("ema_decay", 0)
    # bf16 mixed precision (train.use_amp — the TPU analog of the
    # reference ESRModel's autocast, esc/models/esr_model.py:214-256):
    # compute in bf16, master params / grads / optimizer state / loss in
    # f32. No GradScaler needed — bf16 carries f32's exponent range.
    use_amp = bool(train_opt.get("use_amp", False))
    takes_det = "deterministic" in inspect.signature(net.__call__).parameters

    def loss_fn(params, batch, rng):
        kwargs = {"deterministic": False} if takes_det else {}
        lq = batch["lq"]
        if use_amp:
            params = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, params)
            lq = lq.astype(jnp.bfloat16)
        sr = net.apply({"params": params}, lq,
                       rngs={"droppath": rng}, **kwargs).astype(jnp.float32)
        l_pix = cri_pix(sr, batch["gt"])
        return l_pix, {"l_pix": l_pix}

    def train_step(state: TrainState, batch, rng):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        if grad_mask is not None:
            grads = grad_mask(grads, state.step)
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
