"""GAN losses (ref: basicsr/losses/gan_loss.py).

GANLoss supports the reference's five flavors (:30-41); the wgan variants
take raw outputs, vanilla/lsgan compare against real/fake target labels,
hinge uses relu margins on the discriminator side.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from super_resolution_tpu.utils.registry import LOSS_REGISTRY


def _bce_with_logits(logits, targets):
    # numerically stable sigmoid cross-entropy
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


@LOSS_REGISTRY.register()
class GANLoss:
    """gan_type in {vanilla, lsgan, wgan, wgan_softplus, hinge}."""

    def __init__(self, gan_type: str, real_label_val: float = 1.0,
                 fake_label_val: float = 0.0, loss_weight: float = 1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight
        if gan_type not in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
            raise NotImplementedError(f"GAN type {gan_type} is not implemented.")

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        if self.gan_type == "vanilla":
            target = self.real_label_val if target_is_real else self.fake_label_val
            loss = _bce_with_logits(pred, jnp.full_like(pred, target))
        elif self.gan_type == "lsgan":
            target = self.real_label_val if target_is_real else self.fake_label_val
            loss = jnp.mean((pred - target) ** 2)
        elif self.gan_type == "wgan":
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif self.gan_type == "wgan_softplus":
            loss = (jnp.mean(jax.nn.softplus(-pred)) if target_is_real
                    else jnp.mean(jax.nn.softplus(pred)))
        elif self.gan_type == "hinge":
            if is_disc:
                p = -pred if target_is_real else pred
                loss = jnp.mean(jax.nn.relu(1 + p))
            else:
                loss = -jnp.mean(pred)
        # discriminator keeps unit weight (ref: gan_loss.py:97-100)
        return loss if is_disc else loss * self.loss_weight


def r1_penalty(real_logits_fn, real_img):
    """R1 gradient penalty: E[|grad D(x)|^2] (ref: gan_loss.py::r1_penalty)."""
    grads = jax.grad(lambda x: jnp.sum(real_logits_fn(x)))(real_img)
    return jnp.mean(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))))


def gradient_penalty_loss(disc_fn, real, fake, key):
    """WGAN-GP interpolation penalty (ref: gan_loss.py::gradient_penalty_loss)."""
    alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
    interp = real * alpha + fake * (1 - alpha)

    def scalar_out(x):
        return jnp.sum(disc_fn(x))

    grads = jax.grad(scalar_out)(interp)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=tuple(range(1, grads.ndim))) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


@LOSS_REGISTRY.register()
class MultiScaleGANLoss(GANLoss):
    """GANLoss averaged over a list of multi-scale predictions
    (ref: gan_loss.py::MultiScaleGANLoss)."""

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        if isinstance(pred, (list, tuple)):
            total = 0.0
            for p in pred:
                if isinstance(p, (list, tuple)):
                    p = p[-1]
                total = total + super().__call__(p, target_is_real, is_disc)
            return total / len(pred)
        return super().__call__(pred, target_is_real, is_disc)


def g_path_regularize(decode_fn, latents, mean_path_length, key,
                      decay: float = 0.01):
    """StyleGAN2 path-length regularization (ref: gan_loss.py:159-168).

    decode_fn: latents (B, L, C) -> image (B, H, W, 3); differentiable.
    Returns (path_penalty, mean(path_lengths), new_mean_path_length).
    """
    fake_img = decode_fn(latents)
    h, w = fake_img.shape[1], fake_img.shape[2]
    noise = jax.random.normal(key, fake_img.shape,
                              fake_img.dtype) / jnp.sqrt(float(h * w))
    grad = jax.grad(lambda lt: jnp.sum(decode_fn(lt) * noise))(latents)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad ** 2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths)
                                            - mean_path_length)
    path_penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return path_penalty, jax.lax.stop_gradient(jnp.mean(path_lengths)), \
        jax.lax.stop_gradient(path_mean)


@LOSS_REGISTRY.register()
class GANFeatLoss:
    """pix2pixHD feature-matching loss over multiscale discriminator
    features (consumed by HiFaceGANModel's feature_matching_opt —
    ref: basicsr/models/hifacegan_model.py:36-38; the loss itself is the
    standard upstream-BasicSR GANFeatLoss the reference expects).
    """

    def __init__(self, criterion: str = "l1", loss_weight: float = 1.0,
                 reduction: str = "mean"):
        self.loss_weight = loss_weight
        if criterion == "l1":
            self.crit = lambda a, b: jnp.mean(jnp.abs(a - b))
        elif criterion == "l2":
            self.crit = lambda a, b: jnp.mean((a - b) ** 2)
        elif criterion == "charbonnier":
            self.crit = lambda a, b: jnp.mean(
                jnp.sqrt((a - b) ** 2 + 1e-12))
        else:
            raise ValueError(f"Unsupported criterion {criterion}")

    def __call__(self, pred_fake, pred_real):
        num_d = len(pred_fake)
        loss = 0.0
        for i in range(num_d):
            num_intermediate = len(pred_fake[i]) - 1
            for j in range(num_intermediate):
                loss += self.crit(
                    pred_fake[i][j],
                    jax.lax.stop_gradient(pred_real[i][j])) / num_d
        return loss * self.loss_weight
