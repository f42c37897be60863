"""Train-step smoke + math checks for the StyleGAN2 and HiFaceGAN runners,
and parity of the path-length regularizer against the reference."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp


def test_g_path_regularize_matches_reference(rng):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.losses.gan_loss import g_path_regularize as ref_gpr
    from super_resolution_tpu.losses.gan import g_path_regularize

    b, latents_n, c, h, w = 2, 6, 8, 8, 8
    latents = rng.standard_normal((b, latents_n, c)).astype(np.float32)
    w_mix = rng.standard_normal((c, h * w * 3)).astype(np.float32) * 0.1

    def decode_np(lt):
        return (lt.mean(axis=1) @ w_mix).reshape(b, h, w, 3)

    # torch reference with the identical (linear) decoder and SAME noise
    t_latents = torch.from_numpy(latents).requires_grad_(True)
    t_fake = (t_latents.mean(dim=1) @ torch.from_numpy(w_mix)) \
        .reshape(b, 3, h, w)  # reference is NCHW; noise is iid so layout
    noise = np.random.default_rng(1).standard_normal(
        (b, 3, h, w)).astype(np.float32) / np.sqrt(h * w)

    grad_t = torch.autograd.grad(
        (t_fake * torch.from_numpy(noise)).sum(), t_latents,
        create_graph=False)[0]
    path_lengths_t = torch.sqrt(grad_t.pow(2).sum(2).mean(1))
    mean0 = 0.3
    path_mean_t = mean0 + 0.01 * (path_lengths_t.mean() - mean0)
    penalty_t = (path_lengths_t - path_mean_t).pow(2).mean()

    # jax path with injected identical noise via a shim decode that matches
    # the NCHW element order
    def decode_jax(lt):
        return (lt.mean(axis=1) @ jnp.asarray(w_mix)).reshape(b, 3, h, w) \
            .transpose(0, 2, 3, 1)

    from super_resolution_tpu.losses import gan as gan_mod

    orig_normal = jax.random.normal
    try:
        jax.random.normal = lambda key, shape, dtype=jnp.float32: \
            jnp.asarray(noise.transpose(0, 2, 3, 1)) * np.sqrt(h * w)
        penalty_j, _, new_mean_j = gan_mod.g_path_regularize(
            decode_jax, jnp.asarray(latents), mean0, jax.random.PRNGKey(0))
    finally:
        jax.random.normal = orig_normal
    np.testing.assert_allclose(float(penalty_j), float(penalty_t), rtol=1e-4)
    np.testing.assert_allclose(float(new_mean_j), float(path_mean_t),
                               rtol=1e-4)


@pytest.mark.slow
def test_stylegan2_model_train_smoke(tmp_path):
    from super_resolution_tpu.runtime import build_model

    opt = {
        "name": "sg2", "model_type": "StyleGAN2Model", "is_train": True,
        "manual_seed": 0, "num_gpu": 0,
        "network_g": {"type": "StyleGAN2Generator", "out_size": 16,
                      "num_style_feat": 8, "num_mlp": 2,
                      "channel_multiplier": 1, "narrow": 1 / 32},
        "network_d": {"type": "StyleGAN2Discriminator", "out_size": 16,
                      "channel_multiplier": 1, "narrow": 1 / 32},
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis")},
        "train": {"optim_g": {"type": "Adam", "lr": 2e-3},
                  "optim_d": {"type": "Adam", "lr": 2e-3},
                  "gan_opt": {"type": "GANLoss", "gan_type": "wgan_softplus"},
                  "r1_reg_weight": 10, "path_reg_weight": 2,
                  "net_g_reg_every": 4, "net_d_reg_every": 2,
                  "mixing_prob": 0.9, "path_batch_shrink": 2},
        "val": {"num_val_samples": 2},
    }
    model = build_model(opt)
    gt = np.random.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    for it in (1, 2, 3, 4):
        model.optimize_parameters({"gt": gt}, it)
    logs = model.get_current_log()
    assert "l_g" in logs and "l_d" in logs
    assert "l_g_path" in logs  # iter 4 hits net_g_reg_every
    assert np.isfinite(list(logs.values())).all()
    model.opt["is_train"] = True
    model.nondist_validation(None, 4, None, True)
    import os

    assert os.path.exists(os.path.join(str(tmp_path / "vis"), "train",
                                       "train_4.png"))


@pytest.mark.slow
def test_hifacegan_model_train_smoke(tmp_path):
    from super_resolution_tpu.runtime import build_model

    opt = {
        "name": "hifacegan", "model_type": "HiFaceGANModel", "scale": 1,
        "is_train": True, "manual_seed": 0, "num_gpu": 0,
        "network_g": {"type": "HiFaceGAN", "num_feat": 2, "is_train": True},
        "network_d": {"type": "HiFaceGANDiscriminator", "num_feat": 4,
                      "num_d": 2, "n_layers_d": 2},
        "path": {"models": str(tmp_path / "models"),
                 "visualization": str(tmp_path / "vis")},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-4},
                  "optim_d": {"type": "Adam", "lr": 1e-4},
                  "scheduler": {"type": "MultiStepLR", "milestones": [100],
                                "gamma": 0.5},
                  "pixel_opt": {"type": "L1Loss"},
                  "gan_opt": {"type": "MultiScaleGANLoss",
                              "gan_type": "hinge"},
                  "feature_matching_opt": {"type": "GANFeatLoss",
                                           "loss_weight": 10.0}},
        "val": {"metrics": None},
    }
    model = build_model(opt)
    model.setup_training()
    batch = {"lq": np.random.rand(2, 64, 64, 3).astype(np.float32),
             "gt": np.random.rand(2, 64, 64, 3).astype(np.float32)}
    model.optimize_parameters(batch, 1)
    logs = model.get_current_log()
    assert {"l_g_pix", "l_g_gan", "l_g_feat", "l_d_real",
            "l_d_fake"} <= set(logs)
    assert np.isfinite(list(logs.values())).all()
