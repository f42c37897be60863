"""Real-world GAN SR runners: on-device degradation + G/D training.

Rebuild of the reference's RealHATGAN/RealHATMSE models
(ref: hat/models/realhatgan_model.py:14-282, realhatmse_model.py:13-211;
SRGANModel G/D alternation at basicsr/models/srgan_model.py:85-141).

TPU-native design notes:
- The second-order degradation synthesis (USM -> blur -> random resize ->
  noise -> JPEG -> [blur2] -> resize -> noise -> {JPEG o resize+sinc}) runs
  on device as a sequence of per-shape-jitted stages. Random resize scales
  are discretized to 1/16 steps and intermediate sizes rounded to multiples
  of 16 (JPEG block alignment) so the set of compiled shapes is small and
  static — a deliberate, documented divergence from the reference's
  continuous scales (shape-dynamic programs don't exist under XLA).
- The 180-slot training-pair pool (realhatgan_model.py:29-64) is a host
  ring buffer with the same swap semantics.
- G and D steps are two jitted pure functions over explicit states;
  spectral-norm power-iteration vectors live in the D state's
  'batch_stats' collection and update only during D steps.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax

from super_resolution_tpu.data.transforms import paired_random_crop
from super_resolution_tpu.losses import build_loss
from super_resolution_tpu.losses.gan import GANLoss
from super_resolution_tpu.models import build_network
from super_resolution_tpu.ops.degrade import (add_gaussian_noise,
                                              add_poisson_noise,
                                              filter2d_batch, resize_to,
                                              usm_gaussian_kernel, usm_sharp)
from super_resolution_tpu.ops.diffjpeg import jpeg_compress_decompress
from super_resolution_tpu.runtime.sr_model import HATModel
from super_resolution_tpu.utils.registry import MODEL_REGISTRY


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "mode"))
def _resize_stage(img, out_h, out_w, mode):
    return resize_to(img, out_h, out_w, mode)


@functools.partial(jax.jit, static_argnames=("sigma_range", "gray_prob"))
def _gauss_stage(key, img, sigma_range, gray_prob):
    return add_gaussian_noise(key, img, sigma_range, gray_prob, clip=True)


@functools.partial(jax.jit, static_argnames=("scale_range", "gray_prob"))
def _poisson_stage(key, img, scale_range, gray_prob):
    return add_poisson_noise(key, img, scale_range, gray_prob, clip=True)


_blur_stage = jax.jit(filter2d_batch)
_usm_stage = jax.jit(usm_sharp)


@jax.jit
def _jpeg_stage(img, quality):
    return jpeg_compress_decompress(jnp.clip(img, 0, 1), quality)


@jax.jit
def _final_clamp(img):
    return jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0


def _round16(v: float) -> int:
    return max(16, int(round(v / 16.0)) * 16)


class DegradationSynthesizer:
    """Host-orchestrated, device-executed 2nd-order degradation."""

    def __init__(self, opt: dict, seed: int = 0):
        self.opt = opt
        self.scale = opt["scale"]
        self.usm_kernel = jnp.asarray(usm_gaussian_kernel(50))
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed + 17)

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _rand_scale(self, prob, rng_range):
        updown = self.rng.choice(["up", "down", "keep"], p=np.asarray(prob))
        if updown == "up":
            s = self.rng.uniform(1, rng_range[1])
        elif updown == "down":
            s = self.rng.uniform(rng_range[0], 1)
        else:
            s = 1.0
        return s

    def __call__(self, gt, kernel1, kernel2, sinc_kernel, usm_first=True):
        """gt (B,H,W,3), kernels (B,21,21) -> (lq, gt, gt_usm), cropped to
        gt_size (ref feed_data, realhatgan_model.py:66-183). usm_first=False
        starts the blur chain from gt as given instead of its USM-sharpened
        copy — RealESRNet semantics, where the single gt_usm flag sharpens
        the GT before feed (ref: basicsr/models/realesrnet_model.py:73-85)."""
        opt = self.opt
        gt = jnp.asarray(gt)
        ori_h, ori_w = gt.shape[1], gt.shape[2]
        first = _usm_stage(gt, self.usm_kernel) if usm_first else gt

        # ---------- first order ----------
        out = _blur_stage(first, jnp.asarray(kernel1))
        s = self._rand_scale(opt["resize_prob"], opt["resize_range"])
        mode = self.rng.choice(["area", "bilinear", "bicubic"])
        out = _resize_stage(out, _round16(ori_h * s), _round16(ori_w * s),
                            str(mode))
        gray_prob = opt["gray_noise_prob"]
        if self.rng.uniform() < opt["gaussian_noise_prob"]:
            out = _gauss_stage(self._next_key(), out,
                               tuple(opt["noise_range"]), gray_prob)
        else:
            out = _poisson_stage(self._next_key(), out,
                                 tuple(opt["poisson_scale_range"]), gray_prob)
        quality = jax.random.uniform(
            self._next_key(), (out.shape[0],),
            minval=opt["jpeg_range"][0], maxval=opt["jpeg_range"][1])
        out = _jpeg_stage(out, quality)

        # ---------- second order ----------
        if self.rng.uniform() < opt["second_blur_prob"]:
            out = _blur_stage(out, jnp.asarray(kernel2))
        s = self._rand_scale(opt["resize_prob2"], opt["resize_range2"])
        mode = self.rng.choice(["area", "bilinear", "bicubic"])
        out = _resize_stage(out, _round16(ori_h / self.scale * s),
                            _round16(ori_w / self.scale * s), str(mode))
        gray_prob = opt["gray_noise_prob2"]
        if self.rng.uniform() < opt["gaussian_noise_prob2"]:
            out = _gauss_stage(self._next_key(), out,
                               tuple(opt["noise_range2"]), gray_prob)
        else:
            out = _poisson_stage(self._next_key(), out,
                                 tuple(opt["poisson_scale_range2"]), gray_prob)

        lr_h, lr_w = ori_h // self.scale, ori_w // self.scale
        quality = jax.random.uniform(
            self._next_key(), (out.shape[0],),
            minval=opt["jpeg_range2"][0], maxval=opt["jpeg_range2"][1])
        mode = str(self.rng.choice(["area", "bilinear", "bicubic"]))
        if self.rng.uniform() < 0.5:
            out = _resize_stage(out, lr_h, lr_w, mode)
            out = _blur_stage(out, jnp.asarray(sinc_kernel))
            out = _jpeg_stage(out, quality)
        else:
            out = _jpeg_stage(out, quality)
            out = _resize_stage(out, lr_h, lr_w, mode)
            out = _blur_stage(out, jnp.asarray(sinc_kernel))
        lq = _final_clamp(out)

        # paired random crop to gt_size (host indices, device slices)
        gt_size = opt["gt_size"]
        lq_size = gt_size // self.scale
        top = int(self.rng.integers(0, lr_h - lq_size + 1))
        left = int(self.rng.integers(0, lr_w - lq_size + 1))
        lq = lq[:, top:top + lq_size, left:left + lq_size, :]
        tg, lg = top * self.scale, left * self.scale
        gt = gt[:, tg:tg + gt_size, lg:lg + gt_size, :]
        return lq, gt

    def sharpen(self, gt):
        return _usm_stage(gt, self.usm_kernel)


class PairPool:
    """Training-pair ring buffer for degradation diversity
    (ref: realhatgan_model.py:29-64)."""

    def __init__(self, queue_size: int, seed: int = 0):
        self.queue_size = queue_size
        self.lq = None
        self.gt = None
        self.ptr = 0
        self.rng = np.random.default_rng(seed)

    def __call__(self, lq, gt):
        """Device-resident ring buffer (the reference keeps its queue on
        GPU too — realhatgan_model.py:29-64). Accepts jnp or np arrays;
        only the permutation indices come from the host RNG, so no
        device->host round trip of the batch itself."""
        lq, gt = jnp.asarray(lq), jnp.asarray(gt)
        b = lq.shape[0]
        if self.lq is None:
            assert self.queue_size % b == 0, (
                f"queue size {self.queue_size} must be divisible by batch {b}")
            self.lq = jnp.zeros((self.queue_size,) + lq.shape[1:], lq.dtype)
            self.gt = jnp.zeros((self.queue_size,) + gt.shape[1:], gt.dtype)
        if self.ptr == self.queue_size:
            perm = jnp.asarray(self.rng.permutation(self.queue_size))
            self.lq, self.gt = self.lq[perm], self.gt[perm]
            out_lq, out_gt = self.lq[:b], self.gt[:b]
            self.lq = jax.lax.dynamic_update_slice_in_dim(self.lq, lq, 0, 0)
            self.gt = jax.lax.dynamic_update_slice_in_dim(self.gt, gt, 0, 0)
            return out_lq, out_gt
        self.lq = jax.lax.dynamic_update_slice_in_dim(self.lq, lq,
                                                      self.ptr, 0)
        self.gt = jax.lax.dynamic_update_slice_in_dim(self.gt, gt,
                                                      self.ptr, 0)
        self.ptr += b
        return lq, gt


@MODEL_REGISTRY.register()
class RealHATGANModel(HATModel):
    """GAN-trained real-world SR: net_g + UNet-SN discriminator."""

    with_discriminator = True

    def __init__(self, opt: dict):
        super().__init__(opt)
        if self.with_discriminator and "network_d" in opt:
            self.net_d = build_network(opt["network_d"])
            ws = opt["network_g"].get("window_size", 16) or 16
            gt_size = opt.get("gt_size") or opt.get("datasets", {}).get(
                "train", {}).get("gt_size", 4 * ws * self.scale)
            dummy = jnp.zeros((1, gt_size, gt_size, 3))
            variables = self.net_d.init(jax.random.PRNGKey(1), dummy)
            self.params_d = variables["params"]
            self.sn_stats = variables.get("batch_stats", {})
        else:
            self.net_d = None

    # ------------------------------------------------------------ training
    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.train_loop import (
            TrainState, build_optimizer, init_train_state)

        train_opt = self.opt["train"]
        self.mesh = mesh
        self.ema_decay = train_opt.get("ema_decay", 0)
        self.tx, self.lr_schedule = build_optimizer(train_opt)
        self.state = init_train_state(self.params, self.tx, self.ema_decay)

        deg_opt = dict(self.opt)
        deg_opt.update(train_opt.get("degradation", {}))
        # degradation params live at the top level of the YAML in the
        # reference (resize_prob, noise_range, ...); gt_size in the dataset
        ds_train = self.opt.get("datasets", {}).get("train", {})
        deg_opt.setdefault("gt_size", ds_train.get("gt_size", 256))
        self.high_order = self.opt.get("high_order_degradation", True)
        if self.high_order:
            self.synth = DegradationSynthesizer(
                deg_opt, seed=self.opt.get("manual_seed") or 0)
            self.pool = PairPool(self.opt.get("queue_size", 180),
                                 seed=self.opt.get("manual_seed") or 0)

        self.cri_pix = (build_loss(train_opt["pixel_opt"])
                        if train_opt.get("pixel_opt") else None)
        self.cri_perceptual = (build_loss(train_opt["perceptual_opt"])
                               if train_opt.get("perceptual_opt") else None)
        self.cri_gan = (build_loss(train_opt["gan_opt"])
                        if train_opt.get("gan_opt") and self.net_d is not None
                        else None)
        # LDL loss slot (ref: srgan_model.py:54-57 builds it,
        # realesrgan_model.py:211-225 consumes it via the EMA output)
        self.cri_ldl = (build_loss(train_opt["ldl_opt"])
                        if train_opt.get("ldl_opt") else None)
        self.l1_gt_usm = self.opt.get("l1_gt_usm", True)
        self.percep_gt_usm = self.opt.get("percep_gt_usm", True)
        self.gan_gt_usm = self.opt.get("gan_gt_usm", False)
        self.net_d_iters = train_opt.get("net_d_iters", 1)
        self.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
        self._train_rng = jax.random.PRNGKey(
            (self.opt.get("manual_seed") or 0) + 3)
        self.log_dict = {}

        if self.net_d is not None:
            opt_d = dict(train_opt["optim_d"])
            opt_d.pop("type", None)
            betas = opt_d.pop("betas", (0.9, 0.999))
            self.tx_d = optax.adam(opt_d.pop("lr"), b1=betas[0], b2=betas[1])
            self.opt_state_d = self.tx_d.init(self.params_d)

        self._build_steps()

    def _build_steps(self):
        net_g, net_d = self.net_g, self.net_d
        cri_pix, cri_gan = self.cri_pix, self.cri_gan
        cri_percep = self.cri_perceptual
        cri_ldl = getattr(self, "cri_ldl", None)
        tx, tx_d = self.tx, getattr(self, "tx_d", None)
        ema_decay = self.ema_decay

        def g_loss(params, lq, gt, l1_gt, percep_gt, gan_gt, ema_params,
                   d_params, sn_stats):
            sr = net_g.apply({"params": params}, lq)
            logs = {}
            total = 0.0
            if cri_pix is not None:
                l_pix = cri_pix(sr, l1_gt)
                total += l_pix
                logs["l_g_pix"] = l_pix
            if cri_ldl is not None:
                # LDL (ref: realesrgan_model.py:211-225): artifact map from
                # the PLAIN gt and the EMA model's output; the EMA forward
                # carries no gradient (torch runs it under the frozen
                # net_g_ema)
                from super_resolution_tpu.losses.basic import (
                    get_refined_artifact_map)

                out_ema = net_g.apply({"params": ema_params}, lq)
                # NOTE: torch does not detach the weight map — gradient
                # flows through both the map and sr, matched here
                pw = get_refined_artifact_map(gt, sr, out_ema, 7)
                l_ldl = cri_ldl(pw * sr, pw * gt)
                total += l_ldl
                logs["l_g_ldl"] = l_ldl
            if cri_percep is not None:
                l_p, l_s = cri_percep(sr, percep_gt)
                if l_p is not None:
                    total += l_p
                    logs["l_g_percep"] = l_p
                if l_s is not None:
                    total += l_s
                    logs["l_g_style"] = l_s
            if cri_gan is not None and net_d is not None:
                # torch spectral_norm advances the power-iteration u on
                # EVERY training-mode forward — including the G step's
                # fake pass with frozen D (realhatgan_model.py:203-207);
                # persist the iterated u/sigma so the cadence matches the
                # reference's 3 updates per G+D iteration
                fake_pred, vars_f = net_d.apply(
                    {"params": d_params, "batch_stats": sn_stats}, sr,
                    update_sn_stats=True, mutable=["batch_stats"])
                sn_stats = vars_f["batch_stats"]
                l_gan = cri_gan(fake_pred, True, is_disc=False)
                total += l_gan
                logs["l_g_gan"] = l_gan
            logs["l_g_total"] = total
            return total, (logs, sr, sn_stats)

        def g_step(state, lq, gt, l1_gt, percep_gt, gan_gt, d_params,
                   sn_stats):
            from super_resolution_tpu.runtime.train_loop import TrainState

            (_, (logs, sr, sn_stats)), grads = \
                jax.value_and_grad(g_loss, has_aux=True)(
                    state.params, lq, gt, l1_gt, percep_gt, gan_gt,
                    state.ema_params, d_params, sn_stats)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            if ema_decay > 0:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1 - ema_decay),
                    state.ema_params, params)
            else:
                ema = state.ema_params
            return (TrainState(step=state.step + 1, params=params,
                               ema_params=ema, opt_state=opt_state),
                    logs, sr, sn_stats)

        # G state donated (in-place params/moments/EMA update); d_params and
        # sn_stats are read-only here and stay un-donated
        self._g_step = jax.jit(g_step, donate_argnums=0)

        if net_d is not None:
            def d_loss(d_params, sn_stats, sr, gan_gt):
                real_pred, vars_r = net_d.apply(
                    {"params": d_params, "batch_stats": sn_stats}, gan_gt,
                    update_sn_stats=True, mutable=["batch_stats"])
                l_real = cri_gan(real_pred, True, is_disc=True)
                # fake pass also iterates u in torch (training-mode forward
                # after l_d_real.backward(), srgan_model.py:128-133)
                fake_pred, vars_f = net_d.apply(
                    {"params": d_params,
                     "batch_stats": vars_r["batch_stats"]},
                    jax.lax.stop_gradient(sr),
                    update_sn_stats=True, mutable=["batch_stats"])
                l_fake = cri_gan(fake_pred, False, is_disc=True)
                logs = {"l_d_real": l_real, "l_d_fake": l_fake,
                        "out_d_real": jnp.mean(real_pred),
                        "out_d_fake": jnp.mean(fake_pred)}
                return l_real + l_fake, (logs, vars_f["batch_stats"])

            def d_step(d_params, opt_state_d, sn_stats, sr, gan_gt):
                (_, (logs, new_stats)), grads = jax.value_and_grad(
                    d_loss, has_aux=True)(d_params, sn_stats, sr, gan_gt)
                updates, opt_state_d = tx_d.update(grads, opt_state_d, d_params)
                d_params = optax.apply_updates(d_params, updates)
                return d_params, opt_state_d, new_stats, logs

            # d_params / opt_state_d / sn_stats all round-trip through the
            # step and are reassigned at the call site — donate the trio
            self._d_step = jax.jit(d_step, donate_argnums=(0, 1, 2))

        if ema_decay > 0:
            # the reference runs model_ema EVERY iteration, including ones
            # where the G step is gated off by net_d_iters/net_d_init_iters
            # (srgan_model.py:140-141 is outside the gate) — the EMA still
            # decays toward the unchanged params
            self._ema_step = jax.jit(lambda state: state.replace(
                ema_params=jax.tree.map(
                    lambda e, p: e * ema_decay + p * (1 - ema_decay),
                    state.ema_params, state.params)))

    def feed_data(self, data: dict):
        if self.is_train and self.high_order and "kernel1" in data:
            lq, gt = self.synth(data["gt"], data["kernel1"], data["kernel2"],
                                data["sinc_kernel"])
            # pool is device-resident: the batch never leaves the chip
            self.lq, self.gt = self.pool(lq, gt)
            self.gt_usm = self.synth.sharpen(self.gt)
        else:
            self.lq = jnp.asarray(data["lq"])
            if "gt" in data:
                self.gt = jnp.asarray(data["gt"])
                if self.is_train and hasattr(self, "synth"):
                    self.gt_usm = self.synth.sharpen(self.gt)
                else:
                    self.gt_usm = self.gt

    def optimize_parameters(self, batch: dict, current_iter: int):
        self.feed_data(batch)
        l1_gt = self.gt_usm if self.l1_gt_usm else self.gt
        percep_gt = self.gt_usm if self.percep_gt_usm else self.gt
        gan_gt = self.gt_usm if self.gan_gt_usm else self.gt

        logs = {}
        run_g = (current_iter % self.net_d_iters == 0
                 and current_iter > self.net_d_init_iters)
        sr = None
        if run_g or self.net_d is None:
            self.state, g_logs, sr, new_sn = self._g_step(
                self.state, self.lq, self.gt, l1_gt, percep_gt, gan_gt,
                getattr(self, "params_d", {}), getattr(self, "sn_stats", {}))
            if self.net_d is not None:
                self.sn_stats = new_sn
            self.params = self.state.params
            if self.ema_decay > 0:
                self.ema_params = self.state.ema_params
            logs.update(g_logs)

        if not (run_g or self.net_d is None) and self.ema_decay > 0:
            self.state = self._ema_step(self.state)
            self.ema_params = self.state.ema_params

        if self.net_d is not None:
            if sr is None:
                sr = self.net_g.apply({"params": self.params}, self.lq)
            self.params_d, self.opt_state_d, self.sn_stats, d_logs = \
                self._d_step(self.params_d, self.opt_state_d, self.sn_stats,
                             sr, gan_gt)
            logs.update(d_logs)
        self.log_dict = logs  # device arrays; get_current_log syncs

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img):
        # no degradation synthesis during validation (ref: :185-189)
        was_train = self.is_train
        self.is_train = False
        try:
            super().nondist_validation(dataloader, current_iter, tb_logger,
                                       save_img)
        finally:
            self.is_train = was_train


@MODEL_REGISTRY.register()
class RealHATMSEModel(RealHATGANModel):
    """Same degradation feed_data, no discriminator
    (ref: hat/models/realhatmse_model.py:13-211)."""

    with_discriminator = False


@MODEL_REGISTRY.register()
class RealESRGANMSEModel(RealHATMSEModel):
    """esc's Real-ESRGAN MSE runner name (ref: HAT/ESC/esc/models/
    realesrgan_mse_model.py:13)."""


@MODEL_REGISTRY.register()
class RealESRGANModel(RealHATGANModel):
    """Stock basicsr Real-ESRGAN runner (ref: basicsr/models/
    realesrgan_model.py:16-267) so stock Real-ESRGAN YAMLs resolve.
    Same second-order on-device degradation + G/D recipe as
    RealHATGANModel, with the stock flag semantics: gan_gt defaults to the
    USM-sharpened GT (realesrgan_model.py:197-203 — only an explicit
    `false` switches to the plain GT; the HAT fork defaults it off), and
    the LDL loss slot (train.ldl_opt, :211-225) is honored via the EMA
    output's refined artifact map."""

    def setup_training(self, mesh=None):
        self.opt.setdefault("gan_gt_usm", True)
        super().setup_training(mesh)
        if self.cri_ldl is not None and self.ema_decay <= 0:
            raise ValueError(
                "ldl_opt requires ema_decay > 0 (the reference computes the "
                "artifact map from net_g_ema's output, "
                "realesrgan_model.py:211-212)")


@MODEL_REGISTRY.register()
class RealESRNetModel(RealHATMSEModel):
    """Stock basicsr Real-ESRNet runner (ref: basicsr/models/
    realesrnet_model.py:14-190): the GAN-free pretraining stage. A single
    `gt_usm` flag (default true, as every stock YAML sets it) sharpens the
    GT BEFORE the degradation chain (realesrnet_model.py:73-75), so the
    sharpened GT is both the degradation source and the pixel-loss target
    — unlike the GAN model's three per-loss usm selections."""

    def feed_data(self, data: dict):
        if self.is_train and self.high_order and "kernel1" in data:
            gt = jnp.asarray(data["gt"])
            if self.opt.get("gt_usm", True):
                gt = self.synth.sharpen(gt)
            lq, gt = self.synth(gt, data["kernel1"], data["kernel2"],
                                data["sinc_kernel"], usm_first=False)
            self.lq, self.gt = self.pool(lq, gt)
            # the (maybe-sharpened) GT IS the target; optimize_parameters'
            # l1_gt_usm selection must be a no-op here
            self.gt_usm = self.gt
        else:
            super().feed_data(data)


# --------------------------------------------------------------------------
# Reusable GAN-training attachment for video runners
# (ref: video_gan_model.py:7-19 composes SRGANModel's training with
# VideoBaseModel's validation; video_recurrent_gan_model.py:12-180 adds
# frame flattening for the perceptual loss / discriminator).


def attach_gan_training(model, mesh=None, video: bool = False):
    """Wire SRGAN-style G/D training onto any runner with .net_g/.params."""
    from super_resolution_tpu.runtime.train_loop import (
        TrainState, build_optimizer, init_train_state, make_freeze_mask)

    train_opt = model.opt["train"]
    model.mesh = mesh
    model.ema_decay = train_opt.get("ema_decay", 0)
    lr_rules = None
    if video and train_opt.get("fix_flow") and train_opt.get("lr_flow"):
        # the reference gives the flow net its own lr group (lr_flow,
        # video_recurrent_gan_model.py:57-77)
        base_lr = train_opt["optim_g"]["lr"]
        lr_rules = {"spynet": train_opt["lr_flow"] / base_lr}
    model.tx, model.lr_schedule = build_optimizer(train_opt, lr_rules)
    model.state = init_train_state(model.params, model.tx, model.ema_decay)

    model.net_d = build_network(model.opt["network_d"])
    gt_size = (model.opt.get("datasets", {}).get("train", {})
               .get("gt_size", 128))
    dummy = jnp.zeros((1, gt_size, gt_size, 3))
    variables = model.net_d.init(jax.random.PRNGKey(1), dummy)
    model.params_d = variables["params"]
    model.sn_stats = variables.get("batch_stats", {})

    model.cri_pix = (build_loss(train_opt["pixel_opt"])
                     if train_opt.get("pixel_opt") else None)
    model.cri_perceptual = (build_loss(train_opt["perceptual_opt"])
                            if train_opt.get("perceptual_opt") else None)
    model.cri_gan = build_loss(train_opt["gan_opt"])
    model.net_d_iters = train_opt.get("net_d_iters", 1)
    model.net_d_init_iters = train_opt.get("net_d_init_iters", 0)
    model._train_rng = jax.random.PRNGKey(
        (model.opt.get("manual_seed") or 0) + 3)
    model.log_dict = {}

    opt_d = dict(train_opt["optim_d"])
    opt_d.pop("type", None)
    betas = opt_d.pop("betas", (0.9, 0.999))
    model.tx_d = optax.adam(opt_d.pop("lr"), b1=betas[0], b2=betas[1])
    model.opt_state_d = model.tx_d.init(model.params_d)

    grad_mask = None
    fix_flow = train_opt.get("fix_flow") if video else None
    if fix_flow:
        grad_mask = make_freeze_mask([(("spynet", "edvr"), fix_flow)])

    net_g, net_d = model.net_g, model.net_d
    cri_pix, cri_gan = model.cri_pix, model.cri_gan
    cri_percep = model.cri_perceptual
    tx, tx_d = model.tx, model.tx_d
    ema_decay = model.ema_decay

    def flat(x):
        return x.reshape((-1,) + x.shape[-3:]) if video else x

    import inspect

    has_sn_flag = "update_sn_stats" in inspect.signature(
        net_d.__call__).parameters

    def g_loss(params, lq, gt, d_params, sn_stats):
        sr = net_g.apply({"params": params}, lq)
        logs = {}
        total = 0.0
        if cri_pix is not None:
            l_pix = cri_pix(sr, gt)
            total += l_pix
            logs["l_g_pix"] = l_pix
        if cri_percep is not None:
            l_p, l_s = cri_percep(flat(sr), flat(gt))
            if l_p is not None:
                total += l_p
                logs["l_g_percep"] = l_p
            if l_s is not None:
                total += l_s
                logs["l_g_style"] = l_s
        if has_sn_flag:
            # persist the power-iteration u like torch's training-mode
            # forward does even with frozen D (see RealHATGANModel notes)
            fake_pred, vars_f = net_d.apply(
                {"params": d_params, "batch_stats": sn_stats}, flat(sr),
                update_sn_stats=True, mutable=["batch_stats"])
            sn_stats = vars_f["batch_stats"]
        else:
            fake_pred = net_d.apply({"params": d_params,
                                     "batch_stats": sn_stats}, flat(sr))
        l_gan = cri_gan(fake_pred, True, is_disc=False)
        total += l_gan
        logs["l_g_gan"] = l_gan
        logs["l_g_total"] = total
        return total, (logs, sr, sn_stats)

    def g_step(state, lq, gt, d_params, sn_stats):
        (_, (logs, sr, sn_stats)), grads = \
            jax.value_and_grad(g_loss, has_aux=True)(
                state.params, lq, gt, d_params, sn_stats)
        if grad_mask is not None:
            grads = grad_mask(grads, state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay > 0:
            ema = jax.tree.map(lambda e, p: e * ema_decay + p * (1 - ema_decay),
                               state.ema_params, params)
        else:
            ema = state.ema_params
        return (TrainState(step=state.step + 1, params=params, ema_params=ema,
                           opt_state=opt_state), logs, sr, sn_stats)

    model._g_step = jax.jit(g_step, donate_argnums=0)

    def d_loss(d_params, sn_stats, sr, gt):
        if has_sn_flag:
            real_pred, vars_r = net_d.apply(
                {"params": d_params, "batch_stats": sn_stats}, flat(gt),
                update_sn_stats=True, mutable=["batch_stats"])
            new_stats = vars_r["batch_stats"]
        else:
            real_pred = net_d.apply({"params": d_params,
                                     "batch_stats": sn_stats}, flat(gt))
            new_stats = sn_stats
        l_real = cri_gan(real_pred, True, is_disc=True)
        if has_sn_flag:
            fake_pred, vars_f = net_d.apply(
                {"params": d_params, "batch_stats": new_stats},
                jax.lax.stop_gradient(flat(sr)),
                update_sn_stats=True, mutable=["batch_stats"])
            new_stats = vars_f["batch_stats"]
        else:
            fake_pred = net_d.apply(
                {"params": d_params, "batch_stats": new_stats},
                jax.lax.stop_gradient(flat(sr)))
        l_fake = cri_gan(fake_pred, False, is_disc=True)
        logs = {"l_d_real": l_real, "l_d_fake": l_fake,
                "out_d_real": jnp.mean(real_pred),
                "out_d_fake": jnp.mean(fake_pred)}
        return l_real + l_fake, (logs, new_stats)

    def d_step(d_params, opt_state_d, sn_stats, sr, gt):
        (_, (logs, new_stats)), grads = jax.value_and_grad(
            d_loss, has_aux=True)(d_params, sn_stats, sr, gt)
        updates, opt_state_d = tx_d.update(grads, opt_state_d, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, opt_state_d, new_stats, logs

    model._d_step = jax.jit(d_step, donate_argnums=(0, 1, 2))

    if ema_decay > 0:
        # reference model_ema runs every iteration even when the G step is
        # gated off (srgan_model.py:140-141)
        model._ema_step = jax.jit(lambda state: state.replace(
            ema_params=jax.tree.map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay),
                state.ema_params, state.params)))


def gan_optimize_step(model, batch, current_iter: int):
    """One G/D alternation (ref: srgan_model.py:85-141)."""
    model.feed_data(batch)
    logs = {}
    run_g = (current_iter % model.net_d_iters == 0
             and current_iter > model.net_d_init_iters)
    sr = None
    if run_g:
        model.state, g_logs, sr, model.sn_stats = model._g_step(
            model.state, model.lq, model.gt, model.params_d, model.sn_stats)
        model.params = model.state.params
        if model.ema_decay > 0:
            model.ema_params = model.state.ema_params
        logs.update(g_logs)
    if not run_g and model.ema_decay > 0:
        model.state = model._ema_step(model.state)
        model.ema_params = model.state.ema_params
    if sr is None:
        sr = model.net_g.apply({"params": model.params}, model.lq)
    model.params_d, model.opt_state_d, model.sn_stats, d_logs = model._d_step(
        model.params_d, model.opt_state_d, model.sn_stats, sr, model.gt)
    logs.update(d_logs)
    model.log_dict = logs  # device arrays; get_current_log syncs
