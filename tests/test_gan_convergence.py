"""GAN training-trajectory parity vs the reference stack (round-3 verdict
item 4).

Tiny fork-HAT generator + UNetDiscriminatorSN, identical converted init
(including the spectral-norm power-iteration u vectors), identical data
order, L1 + vanilla GAN + Adam x2 + EMA: N steps through the reference's
G/D alternation semantics (torch CPU — srgan_model.py:85-141: G step gated
by net_d_iters/net_d_init_iters, D real backward before the fake forward,
model_ema every iteration) and through our jitted G/D steps
(runtime/realgan.py RealHATGANModel). Loss trajectories must track —
the test that makes SN power-iteration cadence, the D/G gating, and the
two-optimizer glue load-bearing (1-step smokes can't see cadence bugs).
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
N_STEPS = 150
BATCH, LQ = 2, 16
LR_G, LR_D, EMA_DECAY = 1e-4, 1e-4, 0.999
NET_D_ITERS, NET_D_INIT_ITERS = 1, 3
D_FEAT = 16


def _make_data(n_steps):
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n_steps):
        gt = rng.random((BATCH, LQ * 2, LQ * 2, 3)).astype(np.float32)
        gt = 0.25 * (gt + np.roll(gt, 1, 1) + np.roll(gt, 1, 2)
                     + np.roll(gt, (1, 1), (1, 2)))
        lq = gt.reshape(BATCH, LQ, 2, LQ, 2, 3).mean(axis=(2, 4))
        out.append((lq, gt))
    return out


def _torch_run(batches):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.losses.gan_loss import GANLoss as RefGANLoss
    from hat.archs.discriminator_arch import UNetDiscriminatorSN as RefD
    from hat.archs.hat_arch import HAT as RefHAT

    torch.manual_seed(0)
    net_g = RefHAT(**TINY_KW)
    net_g.train()
    net_d = RefD(num_in_ch=3, num_feat=D_FEAT)
    net_d.train()
    g_sd = {k: v.detach().clone() for k, v in net_g.state_dict().items()}
    d_sd = {k: v.detach().clone() for k, v in net_d.state_dict().items()}

    opt_g = torch.optim.Adam(net_g.parameters(), lr=LR_G, betas=(0.9, 0.99))
    opt_d = torch.optim.Adam(net_d.parameters(), lr=LR_D, betas=(0.9, 0.99))
    cri_gan = RefGANLoss("vanilla", loss_weight=0.1)
    ema = {k: v.detach().clone() for k, v in net_g.named_parameters()}

    logs = []
    # reference loop semantics: srgan_model.py:85-141
    for it, (lq, gt) in enumerate(batches, start=1):
        lq_t = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        gt_t = torch.from_numpy(gt.transpose(0, 3, 1, 2))
        row = {}
        for p in net_d.parameters():
            p.requires_grad = False
        opt_g.zero_grad()
        output = net_g(lq_t)
        if it % NET_D_ITERS == 0 and it > NET_D_INIT_ITERS:
            l_g_pix = torch.nn.functional.l1_loss(output, gt_t)
            l_g_gan = cri_gan(net_d(output), True, is_disc=False)
            (l_g_pix + l_g_gan).backward()
            opt_g.step()
            row["l_g_pix"] = float(l_g_pix)
            row["l_g_gan"] = float(l_g_gan)
        for p in net_d.parameters():
            p.requires_grad = True
        opt_d.zero_grad()
        real_pred = net_d(gt_t)
        l_d_real = cri_gan(real_pred, True, is_disc=True)
        l_d_real.backward()
        fake_pred = net_d(output.detach())
        l_d_fake = cri_gan(fake_pred, False, is_disc=True)
        l_d_fake.backward()
        opt_d.step()
        row["l_d_real"] = float(l_d_real)
        row["l_d_fake"] = float(l_d_fake)
        row["out_d_real"] = float(real_pred.detach().mean())
        row["out_d_fake"] = float(fake_pred.detach().mean())
        with torch.no_grad():
            for k, v in net_g.named_parameters():
                ema[k].mul_(EMA_DECAY).add_(v.detach(), alpha=1 - EMA_DECAY)
        logs.append(row)
    return logs, g_sd, d_sd


def _convert_d(d_sd, flax_params, flax_stats):
    """Torch UNetDiscriminatorSN state_dict -> (params, batch_stats).

    SN convs store weight_orig/weight_u; the flax tree keeps the raw kernel
    under convN and the power-iteration u under
    SpectralNorm_K/{convN/kernel/u}. u is R^{out} in both stacks (torch
    iterates on W reshaped (O, IHW); flax on (HWI, O) — same u up to the
    row permutation of v, which is not stored)."""
    params = jax.tree.map(lambda x: x, flax_params)  # copy structure
    for name, sub in params.items():
        w = d_sd.get(f"{name}.weight", d_sd.get(f"{name}.weight_orig"))
        sub["kernel"] = jnp.asarray(w.numpy().transpose(2, 3, 1, 0))
        if f"{name}.bias" in d_sd:
            sub["bias"] = jnp.asarray(d_sd[f"{name}.bias"].numpy())
    stats = jax.tree.map(lambda x: x, flax_stats)
    for wrapper, sub in stats.items():
        for key in sub:
            conv = key.split("/")[0]
            if key.endswith("/u"):
                sub[key] = jnp.asarray(
                    d_sd[f"{conv}.weight_u"].numpy()[None, :])
    return params, stats


def _jax_run(batches, g_sd, d_sd, tmp_path):
    from super_resolution_tpu.convert import convert_state_dict
    from super_resolution_tpu.runtime import build_model
    from super_resolution_tpu.utils.options import process_options

    opt = {
        "name": "gan_parity", "model_type": "RealHATGANModel", "scale": 2,
        "num_gpu": 1, "manual_seed": 0, "is_train": True,
        "high_order_degradation": False,
        "l1_gt_usm": False, "percep_gt_usm": False, "gan_gt_usm": False,
        "network_g": {"type": "HAT", **{k: list(v) if isinstance(v, tuple)
                                        else v for k, v in TINY_KW.items()}},
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                      "num_feat": D_FEAT},
        "datasets": {"train": {"name": "x", "type": "PairedImageDataset",
                               "phase": "train", "gt_size": LQ * 2}},
        "train": {
            "optim_g": {"type": "Adam", "lr": LR_G, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": LR_D, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [10 ** 6],
                          "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                          "reduction": "mean"},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "loss_weight": 0.1},
            "ema_decay": EMA_DECAY, "total_iter": N_STEPS, "warmup_iter": -1,
            "net_d_iters": NET_D_ITERS,
            "net_d_init_iters": NET_D_INIT_ITERS,
        },
        "path": {"pretrain_network_g": None},
    }
    opt = process_options(opt, str(tmp_path), is_train=True)
    model = build_model(opt)

    model.params = convert_state_dict(
        {k: v.numpy() for k, v in g_sd.items()}, model.params)
    model.params_d, model.sn_stats = _convert_d(
        d_sd, model.params_d, model.sn_stats)
    model.setup_training()

    logs = []
    for it, (lq, gt) in enumerate(batches, start=1):
        model.optimize_parameters(
            {"lq": jnp.asarray(lq), "gt": jnp.asarray(gt)}, it)
        logs.append({k: float(v) for k, v in model.log_dict.items()})
    return logs


def _series(logs, key):
    return np.asarray([r[key] for r in logs if key in r])


@pytest.mark.slow
def test_gan_training_trajectory_parity(tmp_path):
    batches = _make_data(N_STEPS)
    t_logs, g_sd, d_sd = _torch_run(batches)
    j_logs = _jax_run(batches, g_sd, d_sd, tmp_path)

    # the gating pattern matched: G losses absent on exactly the gated iters
    t_gated = [i for i, r in enumerate(t_logs) if "l_g_pix" not in r]
    j_gated = [i for i, r in enumerate(j_logs) if "l_g_pix" not in r]
    assert t_gated == j_gated == list(range(NET_D_INIT_ITERS))

    for key, early_rtol in (("l_g_pix", 2e-3), ("l_g_gan", 5e-3),
                            ("l_d_real", 5e-3), ("l_d_fake", 5e-3)):
        t, j = _series(t_logs, key), _series(j_logs, key)
        assert len(t) == len(j)
        # early steps nearly exact (same init/data/optimizer math/SN cadence)
        np.testing.assert_allclose(j[:10], t[:10], rtol=early_rtol,
                                   atol=2e-3, err_msg=key)
        # late steps track within a few percent (fp drift compounds through
        # the adversarial feedback loop)
        tail_rel = np.abs(j[-30:] - t[-30:]).mean() / \
            max(np.abs(t[-30:]).mean(), 1e-6)
        assert tail_rel < 0.10, f"{key} late divergence {tail_rel:.3f}"

    # both stacks actually learn: pixel loss drops, D separates real/fake
    for logs in (t_logs, j_logs):
        pix = _series(logs, "l_g_pix")
        assert pix[-10:].mean() < 0.9 * pix[:5].mean()
        gap = (_series(logs, "out_d_real")[-10:]
               - _series(logs, "out_d_fake")[-10:]).mean()
        assert gap > 0, "discriminator failed to separate real from fake"
