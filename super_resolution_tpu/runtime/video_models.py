"""Video SR runners: sliding-window + recurrent models, GAN variants.

TPU-native counterparts of the reference's video model layer
(ref: basicsr/models/video_base_model.py:12-160,
video_recurrent_model.py:14-197, edvr_model.py:13-62,
video_gan_model.py:7-19, video_recurrent_gan_model.py:12-180).
Validation accumulates per-folder, per-frame metric tables exactly like
the reference (folder averages, then a cross-folder average drives the
best-metric tracking).
"""

from __future__ import annotations

from collections import Counter
from os import path as osp

import numpy as np

import jax.numpy as jnp

from super_resolution_tpu.metrics import calculate_metric
from super_resolution_tpu.runtime.sr_model import SRModel
from super_resolution_tpu.utils import imwrite, tensor2img
from super_resolution_tpu.utils.registry import MODEL_REGISTRY


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):
    """Sliding-window video SR runner (EDVR/TOF/DUF-style: clip in, center
    frame out) (ref: video_base_model.py:12-160)."""

    center_frame_only = False

    def _example_input(self):
        t = self.opt["network_g"].get("num_frame", 5)
        return jnp.zeros((1, t, 16, 16, 3), jnp.float32)

    def _save_name(self, dataset_name, folder, val_data, frame_idx):
        lq_path = val_data["lq_path"]
        if "vimeo" in dataset_name.lower():
            parts = lq_path.split("/")
            img_name = f'{parts[-3]}_{parts[-2]}_{parts[-1].split(".")[0]}'
        else:
            img_name = osp.splitext(osp.basename(lq_path))[0]
        suffix = self.opt["val"].get("suffix") or self.opt["name"]
        return osp.join(self.opt["path"]["visualization"], dataset_name,
                        folder, f"{img_name}_{suffix}.png")

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        dataset = dataloader.dataset
        dataset_name = dataset.opt["name"]
        metrics_opt = self.opt.get("val", {}).get("metrics")
        if metrics_opt:
            num_frame_each_folder = Counter(dataset.data_info["folder"])
            self.metric_results = {
                folder: np.zeros((n, len(metrics_opt)), np.float32)
                for folder, n in num_frame_each_folder.items()}
            self._initialize_best_metric_results(dataset_name)

        for idx in range(len(dataset)):
            val_data = dataset[idx]
            folder = val_data["folder"]
            frame_idx, max_idx = val_data["idx"].split("/")
            self.feed_data({"lq": val_data["lq"][None],
                            "gt": val_data["gt"][None]})
            self._run_inference()
            result_img = tensor2img(np.asarray(self.output))
            metric_data = {"img": result_img,
                           "img2": tensor2img(np.asarray(self.gt))}
            if save_img:
                if self.opt["is_train"]:
                    raise NotImplementedError(
                        "saving image is not supported during training.")
                imwrite(result_img, self._save_name(dataset_name, folder,
                                                    val_data, frame_idx))
            if metrics_opt:
                for m_idx, opt_ in enumerate(metrics_opt.values()):
                    self.metric_results[folder][int(frame_idx), m_idx] += \
                        calculate_metric(metric_data, opt_)

        if metrics_opt:
            self._log_video_metrics(current_iter, dataset_name, tb_logger)

    def _log_video_metrics(self, current_iter, dataset_name, tb_logger):
        """(ref: video_base_model.py:104-160)."""
        metric_results_avg = {folder: table.mean(axis=0)
                              for folder, table in
                              self.metric_results.items()}
        metrics = list(self.opt["val"]["metrics"].keys())
        total_avg = {m: 0.0 for m in metrics}
        for folder, avg in metric_results_avg.items():
            for i, m in enumerate(metrics):
                total_avg[m] += float(avg[i])
        for m in metrics:
            total_avg[m] /= len(metric_results_avg)
            self._update_best_metric_result(dataset_name, m, total_avg[m],
                                            current_iter)

        log_str = f"Validation {dataset_name}\n"
        for i, (m, value) in enumerate(total_avg.items()):
            log_str += f"\t # {m}: {value:.4f}"
            for folder, avg in metric_results_avg.items():
                log_str += f"\t # {folder}: {float(avg[i]):.4f}"
            rec = self.best_metric_results[dataset_name][m]
            log_str += (f"\n\t    Best: {rec['val']:.4f} @ "
                        f"{rec['iter']} iter\n")
        self.logger.info(log_str)
        if tb_logger:
            for i, (m, value) in enumerate(total_avg.items()):
                tb_logger.add_scalar(f"metrics/{m}", value, current_iter)
                for folder, avg in metric_results_avg.items():
                    tb_logger.add_scalar(f"metrics/{m}/{folder}",
                                         float(avg[i]), current_iter)


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR runner: dcn lr multiplier + TSA-only warmup phase
    (ref: edvr_model.py:13-62)."""

    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.train_loop import (
            build_optimizer, init_train_state, make_freeze_mask,
            make_sr_train_step)
        import jax

        train_opt = self.opt["train"]
        dcn_lr_mul = train_opt.get("dcn_lr_mul", 1)
        lr_rules = {"dcn": dcn_lr_mul} if dcn_lr_mul != 1 else None
        self.mesh = mesh
        self.tx, self.lr_schedule = build_optimizer(train_opt, lr_rules)
        self.ema_decay = train_opt.get("ema_decay", 0)
        self.state = init_train_state(self.params, self.tx, self.ema_decay)
        freeze = None
        tsa_iter = train_opt.get("tsa_iter")
        if tsa_iter:
            freeze = make_freeze_mask([("only", ("fusion",), tsa_iter)])
        step_fn = make_sr_train_step(self.net_g, self.tx, train_opt,
                                     grad_mask=freeze)
        self._train_step = jax.jit(step_fn, donate_argnums=0)
        self._train_rng = jax.random.PRNGKey(
            (self.opt.get("manual_seed") or 0) + 1)
        self.log_dict = {}


@MODEL_REGISTRY.register()
class VideoRecurrentModel(VideoBaseModel):
    """Recurrent video SR runner (BasicVSR family): whole-clip IO, flow lr
    multiplier + flow-freeze warmup (ref: video_recurrent_model.py:14-197).
    """

    def __init__(self, opt):
        super().__init__(opt)
        self.center_frame_only = opt.get("val", {}).get("center_frame_only",
                                                        False)

    def _example_input(self):
        return jnp.zeros((1, 2, 64, 64, 3), jnp.float32)

    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.train_loop import (
            build_optimizer, init_train_state, make_freeze_mask,
            make_sr_train_step)
        import jax

        train_opt = self.opt["train"]
        flow_lr_mul = train_opt.get("flow_lr_mul", 1)
        lr_rules = {"spynet": flow_lr_mul} if flow_lr_mul != 1 else None
        self.mesh = mesh
        self.tx, self.lr_schedule = build_optimizer(train_opt, lr_rules)
        self.ema_decay = train_opt.get("ema_decay", 0)
        self.state = init_train_state(self.params, self.tx, self.ema_decay)
        freeze = None
        fix_flow = train_opt.get("fix_flow")
        if fix_flow:
            freeze = make_freeze_mask([(("spynet", "edvr"), fix_flow)])
        step_fn = make_sr_train_step(self.net_g, self.tx, train_opt,
                                     grad_mask=freeze)
        self._train_step = jax.jit(step_fn, donate_argnums=0)
        self._train_rng = jax.random.PRNGKey(
            (self.opt.get("manual_seed") or 0) + 1)
        self.log_dict = {}

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        """Whole-clip validation: metric table indexed per frame
        (ref: video_recurrent_model.py:64-180)."""
        dataset = dataloader.dataset
        dataset_name = dataset.opt["name"]
        metrics_opt = self.opt.get("val", {}).get("metrics")
        if metrics_opt:
            num_frame_each_folder = Counter(dataset.data_info["folder"])
            self.metric_results = {
                folder: np.zeros((n, len(metrics_opt)), np.float32)
                for folder, n in num_frame_each_folder.items()}
            self._initialize_best_metric_results(dataset_name)

        for i in range(len(dataset)):
            val_data = dataset[i]
            folder = val_data["folder"]
            self.feed_data({"lq": val_data["lq"][None],
                            "gt": val_data["gt"][None]})
            self._run_inference()
            visuals_result = np.asarray(self.output)
            visuals_gt = np.asarray(self.gt)
            if self.center_frame_only:
                t = visuals_result.shape[1]
                visuals_result = visuals_result[:, t // 2:t // 2 + 1]
                visuals_gt = visuals_gt[:, None] if visuals_gt.ndim == 4 \
                    else visuals_gt
            for fi in range(visuals_result.shape[1]):
                result_img = tensor2img(visuals_result[0, fi])
                metric_data = {"img": result_img,
                               "img2": tensor2img(visuals_gt[0, fi])}
                if save_img:
                    if self.opt["is_train"]:
                        raise NotImplementedError(
                            "saving image is not supported during training.")
                    suffix = (self.opt["val"].get("suffix")
                              or self.opt["name"])
                    img_path = osp.join(self.opt["path"]["visualization"],
                                        dataset_name, folder,
                                        f"{fi:08d}_{suffix}.png")
                    imwrite(result_img, img_path)
                if metrics_opt:
                    for m_idx, opt_ in enumerate(metrics_opt.values()):
                        self.metric_results[folder][fi, m_idx] += \
                            calculate_metric(metric_data, opt_)

        if metrics_opt:
            self._log_video_metrics(current_iter, dataset_name, tb_logger)


@MODEL_REGISTRY.register()
class VideoGANModel(VideoBaseModel):
    """Video GAN runner: SRGAN-style G/D training over the center frame +
    VideoBaseModel validation (ref: video_gan_model.py:7-19).

    Training delegates to the GAN step machinery in runtime/realgan.py with
    degradation disabled (the reference composes SRGANModel the same way).
    """

    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.realgan import attach_gan_training

        attach_gan_training(self, mesh)

    def optimize_parameters(self, batch, current_iter):
        from super_resolution_tpu.runtime.realgan import gan_optimize_step

        gan_optimize_step(self, batch, current_iter)


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(VideoRecurrentModel):
    """Recurrent video GAN runner (ref: video_recurrent_gan_model.py:12-180):
    frames are flattened into the batch axis for the perceptual loss and
    discriminator."""

    def setup_training(self, mesh=None):
        from super_resolution_tpu.runtime.realgan import attach_gan_training

        attach_gan_training(self, mesh, video=True)

    def optimize_parameters(self, batch, current_iter):
        from super_resolution_tpu.runtime.realgan import gan_optimize_step

        gan_optimize_step(self, batch, current_iter)
