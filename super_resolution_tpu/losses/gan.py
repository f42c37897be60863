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
