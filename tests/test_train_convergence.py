"""Training-convergence parity vs the reference stack (round-2 verdict
item 5).

Same tiny fork-HAT, identical converted init, identical synthetic data
order, L1 + Adam + cosine-restart schedule + EMA: N steps through the
reference's training semantics (torch CPU — basicsr/train.py:154-198
loop: update_learning_rate before optimize, EMA after the step,
base_model.py:75-82/181-202) and through our functional train step
(runtime/train_loop.py). Loss trajectories must track and the final
EMA-model val PSNR must agree — the only test that makes the training
stack's correctness claim load-bearing (optimizer/EMA/schedule glue bugs
are invisible to 1-step smokes).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TINY_KW = dict(img_size=16, embed_dim=24, depths=(1, 1), num_heads=(2, 2),
               window_size=8, compress_ratio=3, squeeze_factor=6,
               conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
               upscale=2, upsampler="pixelshuffle", drop_path_rate=0.0)
N_STEPS = 200
BATCH, LQ = 2, 16
LR0, ETA_MIN, EMA_DECAY = 2e-4, 1e-7, 0.999


def _make_data(n_steps, n_val=4):
    """Deterministic correlated pairs: gt random smooth-ish, lq = 2x2 box
    mean — a learnable downsampling both stacks see in the same order."""
    rng = np.random.default_rng(42)
    def pair(b):
        gt = rng.random((b, LQ * 2, LQ * 2, 3)).astype(np.float32)
        gt = 0.25 * (gt + np.roll(gt, 1, 1) + np.roll(gt, 1, 2)
                     + np.roll(gt, (1, 1), (1, 2)))
        lq = gt.reshape(b, LQ, 2, LQ, 2, 3).mean(axis=(2, 4))
        return lq, gt
    return ([pair(BATCH) for _ in range(n_steps)],
            [pair(1) for _ in range(n_val)])


def _psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return -10 * float(np.log10(mse))


def _torch_run(batches, val_pairs):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.models.lr_scheduler import CosineAnnealingRestartLR
    from hat.archs.hat_arch import HAT as RefHAT

    torch.manual_seed(0)
    net = RefHAT(**TINY_KW)
    net.train()
    init_sd = {k: v.detach().clone() for k, v in net.state_dict().items()}
    optim = torch.optim.Adam(net.parameters(), lr=LR0, betas=(0.9, 0.99))
    sched = CosineAnnealingRestartLR(optim, periods=[N_STEPS],
                                     restart_weights=[1.0], eta_min=ETA_MIN)
    ema = {k: v.detach().clone() for k, v in net.named_parameters()}
    losses = []
    for it, (lq, gt) in enumerate(batches, start=1):
        if it > 1:          # reference update_learning_rate semantics
            sched.step()
        lq_t = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        gt_t = torch.from_numpy(gt.transpose(0, 3, 1, 2))
        optim.zero_grad()
        loss = torch.nn.functional.l1_loss(net(lq_t), gt_t)
        loss.backward()
        optim.step()
        with torch.no_grad():
            for k, v in net.named_parameters():
                ema[k].mul_(EMA_DECAY).add_(v.detach(), alpha=1 - EMA_DECAY)
        losses.append(float(loss))
    # eval with EMA weights (the reference validates net_g_ema)
    with torch.no_grad():
        backup = {k: v.detach().clone() for k, v in net.named_parameters()}
        for k, v in net.named_parameters():
            v.copy_(ema[k])
        net.eval()
        outs = [net(torch.from_numpy(lq.transpose(0, 3, 1, 2))).numpy()
                .transpose(0, 2, 3, 1) for lq, _ in val_pairs]
        for k, v in net.named_parameters():
            v.copy_(backup[k])
    psnr = float(np.mean([_psnr(o, gt) for o, (_, gt) in zip(outs, val_pairs)]))
    return np.asarray(losses), psnr, init_sd


def _jax_run(batches, val_pairs, torch_init_sd):
    from super_resolution_tpu.convert import convert_state_dict
    from super_resolution_tpu.models.hat_arch import HAT
    from super_resolution_tpu.runtime.train_loop import (build_optimizer,
                                                         init_train_state,
                                                         make_sr_train_step)

    net = HAT(**TINY_KW)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, LQ, LQ, 3)))
    sd = {k: v.numpy() for k, v in torch_init_sd.items()}
    params = convert_state_dict(sd, variables["params"])
    train_opt = {
        "optim_g": {"type": "Adam", "lr": LR0, "betas": [0.9, 0.99]},
        "scheduler": {"type": "CosineAnnealingRestartLR",
                      "periods": [N_STEPS], "restart_weights": [1.0],
                      "eta_min": ETA_MIN},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                      "reduction": "mean"},
        "ema_decay": EMA_DECAY, "total_iter": N_STEPS, "warmup_iter": -1,
    }
    tx, _ = build_optimizer(train_opt)
    state = init_train_state(params, tx, EMA_DECAY)
    step = jax.jit(make_sr_train_step(net, tx, train_opt))
    rng = jax.random.PRNGKey(1)
    losses = []
    for lq, gt in batches:
        state, logs = step(state, {"lq": jnp.asarray(lq),
                                   "gt": jnp.asarray(gt)}, rng)
        losses.append(float(logs["l_pix"]))
    outs = [np.asarray(net.apply({"params": state.ema_params},
                                 jnp.asarray(lq))) for lq, _ in val_pairs]
    psnr = float(np.mean([_psnr(o, gt) for o, (_, gt) in zip(outs, val_pairs)]))
    return np.asarray(losses), psnr


@pytest.mark.slow
def test_training_convergence_parity():
    batches, val_pairs = _make_data(N_STEPS)
    t_losses, t_psnr, init_sd = _torch_run(batches, val_pairs)
    j_losses, j_psnr = _jax_run(batches, val_pairs, init_sd)

    # both stacks actually LEARN: loss drops substantially from start
    # (measured ~0.61x after 200 steps on this synthetic task)
    assert t_losses[-20:].mean() < 0.7 * t_losses[:5].mean()
    assert j_losses[-20:].mean() < 0.7 * j_losses[:5].mean()

    # trajectories track: early steps nearly exact (same data, same init,
    # same optimizer math), late steps within a few percent (fp drift
    # compounds over hundreds of steps)
    np.testing.assert_allclose(j_losses[:20], t_losses[:20], rtol=2e-3,
                               atol=2e-4)
    tail_rel = np.abs(j_losses[-50:] - t_losses[-50:]).mean() / \
        t_losses[-50:].mean()
    assert tail_rel < 0.05, f"late-loss divergence {tail_rel:.3f}"

    # final EMA-model validation PSNR agrees
    assert abs(j_psnr - t_psnr) <= 0.05, (j_psnr, t_psnr)
