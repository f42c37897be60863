"""HiFaceGAN runner: conditional multiscale-PatchGAN face renovation
training (ref: basicsr/models/hifacegan_model.py:12-288).

The conditional discriminator sees cat(lq, img) and the fake/real pair is
fed as ONE doubled batch (shared norm statistics — hifacegan_model.py:
56-75); G gets pixel + perceptual + multiscale GAN + feature-matching
losses. Both steps are jitted pure functions.
"""

from __future__ import annotations

import numpy as np
import optax

import jax
import jax.numpy as jnp

from super_resolution_tpu.losses import build_loss
from super_resolution_tpu.models import build_network
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.runtime.sr_model import SRModel
from super_resolution_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class HiFaceGANModel(SRModel):
    """Face renovation GAN runner."""

    def _example_input(self):
        return jnp.zeros((1, 64, 64, 3), jnp.float32)

    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.train_loop import (
            build_optimizer, init_train_state)

        train_opt = self.opt["train"]
        if train_opt.get("ema_decay", 0) > 0:
            raise NotImplementedError(
                "HiFaceGAN does not support EMA now (ref parity).")
        self.mesh = mesh
        self.ema_decay = 0
        self.tx, self.lr_schedule = build_optimizer(train_opt)
        self.state = init_train_state(self.params, self.tx, 0)

        self.net_d = build_network(self.opt["network_d"])
        d_in = 64
        d_vars = self.net_d.init(jax.random.PRNGKey(1),
                                 jnp.zeros((2, d_in, d_in, 6)))
        self.params_d = d_vars["params"]

        self.cri_pix = (build_loss(train_opt["pixel_opt"])
                        if train_opt.get("pixel_opt") else None)
        self.cri_perceptual = (build_loss(train_opt["perceptual_opt"])
                               if train_opt.get("perceptual_opt") else None)
        self.cri_feat = (build_loss(train_opt["feature_matching_opt"])
                         if train_opt.get("feature_matching_opt") else None)
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError("Both pixel and perceptual losses are None.")
        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)

        opt_d = dict(train_opt["optim_d"])
        opt_d.pop("type", None)
        betas = opt_d.pop("betas", (0.9, 0.999))
        self.tx_d = optax.adam(opt_d.pop("lr"), b1=betas[0], b2=betas[1])
        self.opt_state_d = self.tx_d.init(self.params_d)
        self.log_dict = {}
        self._build_steps()

    def _discriminate(self, d_params, lq, output, gt):
        """(ref: hifacegan_model.py:56-93) — fake and real share one batch."""
        h, w = output.shape[1], output.shape[2]
        if (lq.shape[1], lq.shape[2]) != (h, w):
            lq = resize_to(lq, h, w, "nearest")
            gt = resize_to(gt, h, w, "nearest")
        fake_concat = jnp.concatenate([lq, output], axis=-1)
        real_concat = jnp.concatenate([lq, gt], axis=-1)
        both = jnp.concatenate([fake_concat, real_concat], axis=0)
        out = self.net_d.apply({"params": d_params}, both)
        b = fake_concat.shape[0]
        pred_fake = [[t[:b] for t in scale] for scale in out]
        pred_real = [[t[b:] for t in scale] for scale in out]
        return pred_fake, pred_real

    def _build_steps(self):
        from super_resolution_tpu.runtime.train_loop import TrainState

        net_g = self.net_g
        cri_pix, cri_percep = self.cri_pix, self.cri_perceptual
        cri_gan, cri_feat = self.cri_gan, self.cri_feat
        tx, tx_d = self.tx, self.tx_d

        def g_loss(params, lq, gt, d_params):
            sr = net_g.apply({"params": params}, lq)
            logs = {}
            total = 0.0
            if cri_pix is not None:
                l_pix = cri_pix(sr, gt)
                total += l_pix
                logs["l_g_pix"] = l_pix
            if cri_percep is not None:
                l_p, l_s = cri_percep(sr, gt)
                if l_p is not None:
                    total += l_p
                    logs["l_g_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    logs["l_g_style"] = l_s
            pred_fake, pred_real = self._discriminate(d_params, lq, sr, gt)
            l_gan = cri_gan(pred_fake, True, is_disc=False)
            total += l_gan
            logs["l_g_gan"] = l_gan
            if cri_feat is not None:
                l_feat = cri_feat(pred_fake, pred_real)
                total += l_feat
                logs["l_g_feat"] = l_feat
            logs["l_g_total"] = total
            return total, (logs, sr)

        def g_step(state, lq, gt, d_params):
            (_, (logs, sr)), grads = jax.value_and_grad(g_loss, has_aux=True)(
                state.params, lq, gt, d_params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=params,
                              ema_params=state.ema_params,
                              opt_state=opt_state), logs, sr

        # G state donated (in-place update; the call site reassigns)
        self._g_step = jax.jit(g_step, donate_argnums=0)

        def d_loss(d_params, lq, sr, gt):
            pred_fake, pred_real = self._discriminate(
                d_params, lq, jax.lax.stop_gradient(sr), gt)
            l_real = cri_gan(pred_real, True, is_disc=True)
            l_fake = cri_gan(pred_fake, False, is_disc=True)
            logs = {"l_d_real": l_real, "l_d_fake": l_fake}
            return (l_real + l_fake) / 2, logs

        def d_step(d_params, opt_state_d, lq, sr, gt):
            (_, logs), grads = jax.value_and_grad(d_loss, has_aux=True)(
                d_params, lq, sr, gt)
            updates, opt_state_d = tx_d.update(grads, opt_state_d, d_params)
            return optax.apply_updates(d_params, updates), opt_state_d, logs

        self._d_step = jax.jit(d_step, donate_argnums=(0, 1))

    def optimize_parameters(self, batch, current_iter):
        self.feed_data(batch)
        logs = {}
        sr = None
        if (current_iter % self.net_d_iters == 0
                and current_iter > self.net_d_init_iters):
            self.state, g_logs, sr = self._g_step(self.state, self.lq,
                                                  self.gt, self.params_d)
            self.params = self.state.params
            logs.update(g_logs)
        if sr is None:
            sr = self.net_g.apply({"params": self.params}, self.lq)
        self.params_d, self.opt_state_d, d_logs = self._d_step(
            self.params_d, self.opt_state_d, self.lq, sr, self.gt)
        logs.update(d_logs)
        self.log_dict = logs  # device arrays; get_current_log syncs
