"""StyleGAN2 runner: non-saturating GAN training with lazy R1 and
path-length regularization (ref: basicsr/models/stylegan2_model.py:15-283).

TPU notes: the reference interleaves plain and regularization steps with
separate backward passes; here each variant is its own jitted pure step
(plain-D, D+R1, plain-G, G+path). Lazy regularization's optimizer rescale
(lr * reg_every/(reg_every+1), betas ** ratio — stylegan2_model.py:61-135)
is applied when building the optax transforms. The R1 and path penalties
are jax.grad-through-jax.grad (second-order autodiff, no autograd.grad
bookkeeping)."""

from __future__ import annotations

from os import path as osp

import numpy as np
import optax

import jax
import jax.numpy as jnp

from super_resolution_tpu.losses import build_loss
from super_resolution_tpu.losses.gan import g_path_regularize, r1_penalty
from super_resolution_tpu.models import build_network
from super_resolution_tpu.utils import get_root_logger, imwrite, tensor2img
from super_resolution_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class StyleGAN2Model:
    """Unconditional StyleGAN2 trainer/sampler."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.is_train = opt.get("is_train", False)
        self.logger = get_root_logger()
        self.net_g = build_network(opt["network_g"])
        self.num_style_feat = opt["network_g"]["num_style_feat"]

        seed = opt.get("manual_seed") or 0
        self._rng = jax.random.PRNGKey(seed)
        init_rng, fix_rng, self._rng = jax.random.split(self._rng, 3)
        num_val_samples = opt.get("val", {}).get("num_val_samples", 16)
        self.fixed_sample = jax.random.normal(
            fix_rng, (num_val_samples, self.num_style_feat))

        variables = self.net_g.init(
            {"params": init_rng, "noise": init_rng},
            [jnp.zeros((1, self.num_style_feat))])
        self.params = variables["params"]
        self.ema_params = jax.tree.map(jnp.copy, self.params)

        load_path = opt["path"].get("pretrain_network_g")
        if load_path:
            from super_resolution_tpu.convert import load_torch_checkpoint

            self.params = load_torch_checkpoint(
                load_path, self.params,
                param_key=opt["path"].get("param_key_g", "params"),
                strict=opt["path"].get("strict_load_g", True))
            self.ema_params = load_torch_checkpoint(
                load_path, self.ema_params, param_key="params_ema",
                strict=False)

        self.log_dict = {}
        self.best_metric_results = {}
        if self.is_train:
            self.init_training_settings()

    # ---------------------------------------------------------------- train
    def init_training_settings(self):
        train_opt = self.opt["train"]
        self.net_d = build_network(self.opt["network_d"])
        out_size = self.opt["network_d"]["out_size"]
        d_vars = self.net_d.init(jax.random.PRNGKey(1),
                                 jnp.zeros((1, out_size, out_size, 3)))
        self.params_d = d_vars["params"]

        self.cri_gan = build_loss(train_opt["gan_opt"])
        self.r1_reg_weight = train_opt["r1_reg_weight"]
        self.path_reg_weight = train_opt["path_reg_weight"]
        self.net_g_reg_every = train_opt["net_g_reg_every"]
        self.net_d_reg_every = train_opt["net_d_reg_every"]
        self.mixing_prob = train_opt["mixing_prob"]
        self.path_batch_shrink = train_opt.get("path_batch_shrink", 2)
        self.mean_path_length = jnp.zeros(())
        self.ema_decay = 0.5 ** (32 / (10 * 1000))

        g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        self.tx_g = optax.adam(train_opt["optim_g"]["lr"] * g_ratio,
                               b1=0.0 ** g_ratio, b2=0.99 ** g_ratio)
        self.tx_d = optax.adam(train_opt["optim_d"]["lr"] * d_ratio,
                               b1=0.0 ** d_ratio, b2=0.99 ** d_ratio)
        self.opt_state_g = self.tx_g.init(self.params)
        self.opt_state_d = self.tx_d.init(self.params_d)
        self._build_steps()

    def _gen(self, params, styles, rng, **kwargs):
        return self.net_g.apply({"params": params}, styles,
                                rngs={"noise": rng}, **kwargs)

    def _build_steps(self):
        net_g, net_d = self.net_g, self.net_d
        cri_gan = self.cri_gan
        tx_g, tx_d = self.tx_g, self.tx_d

        def gen(params, styles, rng, **kw):
            return net_g.apply({"params": params}, styles,
                               rngs={"noise": rng}, **kw)

        def d_step(params_d, opt_state_d, params_g, real_img, noises, rng,
                   inject_index, do_r1, r1_weight, reg_every):
            fake_img, _ = gen(params_g, noises, rng,
                              inject_index=inject_index)

            def loss_fn(pd):
                fake_pred = net_d.apply({"params": pd},
                                        jax.lax.stop_gradient(fake_img))
                real_pred = net_d.apply({"params": pd}, real_img)
                l_d = (cri_gan(real_pred, True, is_disc=True)
                       + cri_gan(fake_pred, False, is_disc=True))
                logs = {"l_d": l_d, "real_score": jnp.mean(real_pred),
                        "fake_score": jnp.mean(fake_pred)}
                if do_r1:
                    l_r1 = r1_penalty(
                        lambda x: net_d.apply({"params": pd}, x), real_img)
                    l_r1 = r1_weight / 2 * l_r1 * reg_every
                    l_d = l_d + l_r1
                    logs["l_d_r1"] = l_r1
                return l_d, logs

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_d)
            updates, opt_state_d = tx_d.update(grads, opt_state_d, params_d)
            return optax.apply_updates(params_d, updates), opt_state_d, logs

        # params_d/opt_state_d donated (reassigned at the call site);
        # params_g is a read-only arg and stays un-donated
        self._d_step = jax.jit(d_step, static_argnames=("do_r1",),
                               donate_argnums=(0, 1))

        def g_step(params_g, opt_state_g, params_d, noises, rng,
                   inject_index):
            def loss_fn(pg):
                fake_img, _ = gen(pg, noises, rng,
                                  inject_index=inject_index)
                fake_pred = net_d.apply({"params": params_d}, fake_img)
                l_g = cri_gan(fake_pred, True, is_disc=False)
                return l_g, {"l_g": l_g}

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_g)
            updates, opt_state_g = tx_g.update(grads, opt_state_g, params_g)
            return optax.apply_updates(params_g, updates), opt_state_g, logs

        self._g_step = jax.jit(g_step, donate_argnums=(0, 1))

        path_weight = self.path_reg_weight
        g_reg_every = self.net_g_reg_every

        def g_reg_step(params_g, opt_state_g, noises, mean_path_length,
                       noise_rng, path_key, inject_index):
            def loss_fn(pg):
                # latents from the style MLP, then the path penalty of the
                # synthesis decode (grad-through-grad)
                _, latents = gen(pg, noises, noise_rng, return_latents=True,
                                 inject_index=inject_index)

                def decode(lt):
                    img, _ = gen(pg, [lt], noise_rng, input_is_latent=True)
                    return img

                penalty, path_len, new_mean = g_path_regularize(
                    decode, latents, mean_path_length, path_key)
                l_path = path_weight * g_reg_every * penalty
                return l_path, {"l_g_path": l_path,
                                "path_length": path_len,
                                "_new_mean": new_mean}

            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params_g)
            updates, opt_state_g = tx_g.update(grads, opt_state_g, params_g)
            new_mean = logs.pop("_new_mean")
            return (optax.apply_updates(params_g, updates), opt_state_g,
                    new_mean, logs)

        self._g_reg_step = jax.jit(g_reg_step, donate_argnums=(0, 1))

    def mixing_noise(self, batch, prob, rng):
        """Host-side sampling (ref: stylegan2_model.py:141-146); returns
        (styles, inject_index) — the index is dynamic, the list length is
        the only retrace key."""
        k1, k2, k3 = jax.random.split(rng, 3)
        if float(jax.random.uniform(k1)) < prob:
            import math

            n = jax.random.normal(k2, (2, batch, self.num_style_feat))
            num_latent = int(math.log2(
                self.opt["network_g"]["out_size"])) * 2 - 2
            inject = int(jax.random.randint(k3, (), 1, num_latent - 1))
            return [n[0], n[1]], jnp.asarray(inject)
        return [jax.random.normal(k2, (batch, self.num_style_feat))], None

    def feed_data(self, data):
        self.real_img = jnp.asarray(data["gt"])

    def optimize_parameters(self, batch, current_iter):
        self.feed_data(batch)
        b = self.real_img.shape[0]
        logs = {}
        self._rng, k_mix, k_noise, k_mix2, k_noise2, k_mix3, k_path = \
            jax.random.split(self._rng, 7)

        noises, inject = self.mixing_noise(b, self.mixing_prob, k_mix)
        do_r1 = current_iter % self.net_d_reg_every == 0
        self.params_d, self.opt_state_d, d_logs = self._d_step(
            self.params_d, self.opt_state_d, self.params, self.real_img,
            noises, k_noise, inject, do_r1, self.r1_reg_weight,
            self.net_d_reg_every)
        logs.update(d_logs)

        noises, inject = self.mixing_noise(b, self.mixing_prob, k_mix2)
        self.params, self.opt_state_g, g_logs = self._g_step(
            self.params, self.opt_state_g, self.params_d, noises, k_noise2,
            inject)
        logs.update(g_logs)

        if current_iter % self.net_g_reg_every == 0:
            path_batch = max(1, b // self.path_batch_shrink)
            noises, inject = self.mixing_noise(path_batch, self.mixing_prob,
                                               k_mix3)
            self.params, self.opt_state_g, self.mean_path_length, p_logs = \
                self._g_reg_step(self.params, self.opt_state_g, noises,
                                 self.mean_path_length, k_noise2, k_path,
                                 inject)
            logs.update(p_logs)

        self.ema_params = jax.tree.map(
            lambda e, p: e * self.ema_decay + p * (1 - self.ema_decay),
            self.ema_params, self.params)
        self.log_dict = logs  # device arrays; get_current_log syncs

    def current_lrs(self, current_iter):
        return [float(self.opt["train"]["optim_g"]["lr"])]

    def get_current_log(self):
        # one device_get at print time, not a float() sync per step
        return {k: float(v) for k, v in jax.device_get(self.log_dict).items()}

    # ----------------------------------------------------------------- eval
    def test(self):
        self._rng, rng = jax.random.split(self._rng)
        self.output, _ = self._gen(self.ema_params, [self.fixed_sample], rng)

    def validation(self, dataloader, current_iter, tb_logger=None,
                   save_img=True):
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        assert dataloader is None, "Validation dataloader should be None."
        self.test()
        # tile samples into a 4-per-row grid (the reference's make_grid)
        out = np.asarray(self.output)
        n, h, w, c = out.shape
        cols = min(4, n)
        rows = (n + cols - 1) // cols
        grid = np.zeros((rows * h, cols * w, c), out.dtype)
        for i in range(n):
            r, col = divmod(i, cols)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = out[i]
        result = tensor2img(grid, min_max=(-1, 1))
        if self.opt["is_train"]:
            save_img_path = osp.join(self.opt["path"]["visualization"],
                                     "train", f"train_{current_iter}.png")
        else:
            save_img_path = osp.join(self.opt["path"]["visualization"],
                                     "test", f'test_{self.opt["name"]}.png')
        imwrite(result, save_img_path)

    def save(self, epoch, current_iter):
        from super_resolution_tpu.runtime.checkpoint import save_params

        tree = {"params": jax.tree.map(np.asarray, self.params),
                "params_ema": jax.tree.map(np.asarray, self.ema_params),
                "epoch": epoch, "iter": current_iter}
        if getattr(self, "params_d", None) is not None:
            tree["params_d"] = jax.tree.map(np.asarray, self.params_d)
        save_params(osp.join(self.opt["path"]["models"],
                             f"net_g_{current_iter}"), tree)

    def resume_training(self, resume_path):
        from super_resolution_tpu.runtime.checkpoint import load_tree

        tree = load_tree(resume_path)
        self.params = jax.tree.map(jnp.asarray, tree["params"])
        self.ema_params = jax.tree.map(jnp.asarray, tree["params_ema"])
        if "params_d" in tree and getattr(self, "params_d", None) is not None:
            self.params_d = jax.tree.map(jnp.asarray, tree["params_d"])
        return int(tree["epoch"]), int(tree["iter"])
