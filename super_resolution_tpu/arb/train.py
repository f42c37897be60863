"""Arbitrary-scale training loop (ref: esc_arb/train.py:19-226).

The reference runs an epoch-based loop with L1 on sampled pixels, multi-step
LR decay, per-epoch checkpoints and best-PSNR tracking. Here the train step
is one jitted pure function; the model is any head from arb.models
(LIIF/LTE/MetaSR over any registered encoder).

config (dict or YAML):
  model: {name, args}           # arb spec
  train_dataset: {dataset: {...}, wrapper: {...}, batch_size}
  val_dataset: {...}            # optional
  optimizer: {lr}
  epoch_max, multi_step_lr: {milestones, gamma}
  epoch_val, epoch_save
"""

from __future__ import annotations

import functools
import os
from os import path as osp

import numpy as np

import jax
import jax.numpy as jnp
import optax

from super_resolution_tpu.arb.models import make
from super_resolution_tpu.utils import get_root_logger


def make_train_step(model, tx):
    def loss_fn(params, batch):
        pred = model.apply({"params": params}, batch["inp"], batch["coord"],
                           batch["cell"])
        return jnp.mean(jnp.abs(pred - batch["gt"]))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_arb(config: dict, save_path: str = "./arb_exp"):
    from super_resolution_tpu.data import TrainLoader, build_dataset
    from super_resolution_tpu.runtime.checkpoint import save_params
    from super_resolution_tpu.runtime.schedulers import multistep_restart_lr

    logger = get_root_logger()
    os.makedirs(save_path, exist_ok=True)

    model = make(config["model"])
    ds_opt = dict(config["train_dataset"])
    batch_size = ds_opt.pop("batch_size", 16)
    train_ds = build_dataset(ds_opt)
    loader = TrainLoader(train_ds, batch_size=batch_size,
                         seed=config.get("seed", 0))

    sample = next(iter(loader.epoch_iter(0)))
    params = model.init(jax.random.PRNGKey(config.get("seed", 0)),
                        jnp.asarray(sample["inp"]),
                        jnp.asarray(sample["coord"]),
                        jnp.asarray(sample["cell"]))["params"]

    base_lr = config["optimizer"]["lr"]
    ms = config.get("multi_step_lr")
    if ms:
        iters_per_epoch = max(1, len(loader))
        schedule = multistep_restart_lr(
            base_lr, [m * iters_per_epoch for m in ms["milestones"]],
            ms.get("gamma", 0.5))
    else:
        schedule = base_lr
    tx = optax.adam(schedule)
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    epoch_max = config.get("epoch_max", 1)
    for epoch in range(1, epoch_max + 1):
        losses = []
        for batch in loader.epoch_iter(epoch):
            data = {k: jnp.asarray(v) for k, v in batch.items()
                    if isinstance(v, np.ndarray)}
            params, opt_state, loss = step(params, opt_state, data)
            losses.append(float(loss))
        logger.info(f"[arb] epoch {epoch}/{epoch_max} "
                    f"loss={np.mean(losses):.4f}")
        if epoch % config.get("epoch_save", 1) == 0:
            save_params(osp.join(save_path, f"epoch-{epoch}"),
                        {"params": jax.tree.map(np.asarray, params),
                         "epoch": epoch})
    save_params(osp.join(save_path, "epoch-last"),
                {"params": jax.tree.map(np.asarray, params),
                 "epoch": epoch_max})
    return model, params
