"""Generate the config corpus: ESC / esc_arb / HAT-ImageNet option files.

Emits every experiment configuration the reference ships
(HAT/options/{test,train}, HAT/ESC/options/{test,train},
HAT/ESC/esc_arb/configs/{test,train-div2k}) adapted to this framework's
schema and dataroot conventions. Hyperparameters (network shapes, LR
schedules, crop sizes, loss weights) are the experiment SPEC and are kept
identical; everything else — dataroots, pretrain paths, key layout for the
arb stack — follows this repo's conventions.

Run from the repo root:  python scripts/gen_options.py
The emitted files are committed; re-run only when templates change.
"""

from __future__ import annotations

import os
from os import path as osp

import yaml

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))

SETS5 = ["Set5", "Set14", "B100", "Urban100", "Manga109"]
PRETRAIN = "./experiments/pretrained_models"


def dump(rel_path: str, header: str, opt: dict):
    path = osp.join(ROOT, "options", rel_path)
    os.makedirs(osp.dirname(path), exist_ok=True)
    body = yaml.dump(opt, sort_keys=False, default_flow_style=None, width=78)
    with open(path, "w") as f:
        f.write("".join(f"# {line}\n" if line else "#\n"
                        for line in header.splitlines()))
        f.write("\n" + body)
    return path


# --------------------------------------------------------------- ESC family

def esc_val_sets(scale: int, phase: str = "test") -> dict:
    """5-benchmark paired sets in the ESC layout (HR + LR_bicubic/Xs,
    '{}xs' stems)."""
    out = {}
    for i, name in enumerate(SETS5, start=1):
        out[f"{phase}_{i}"] = {
            "name": name,
            "type": "PairedImageDataset",
            "dataroot_gt": f"./datasets/{name}/HR",
            "dataroot_lq": f"./datasets/{name}/LR_bicubic/X{scale}",
            "filename_tmpl": "{}" + f"x{scale}",
            "io_backend": {"type": "disk"},
        }
    return out


def psnr_ssim_metrics(scale: int) -> dict:
    return {
        "psnr": {"type": "calculate_psnr", "crop_border": scale,
                 "test_y_channel": True},
        "ssim": {"type": "calculate_ssim", "crop_border": scale,
                 "test_y_channel": True},
    }


# network_g blocks per family (spec: HAT/ESC/options/*: ESC dim64/pdim16/
# k13/blocks5x5/ws32/h4/exp1.25; light n_blocks3; XL dim192/pdim48/blocks8/
# ws48/h12/ln; FP dim48/h3; Real ESCReal blocks10/exp2)
def esc_net(scale: int, variant: str) -> dict:
    base = {"type": "ESC", "dim": 64, "pdim": 16, "kernel_size": 13,
            "n_blocks": 5, "conv_blocks": 5, "window_size": 32,
            "num_heads": 4, "upscaling_factor": scale, "exp_ratio": 1.25,
            "attn_type": "xla"}  # backend selector: 'xla' | 'pallas'
    if variant == "light":
        base["n_blocks"] = 3
    elif variant == "xl":
        base.update(dim=192, pdim=48, n_blocks=8, window_size=48,
                    num_heads=12, use_ln=True)
    elif variant == "fp":
        base.update(type="ESCFP", dim=48, num_heads=3)
    elif variant == "real":
        base.update(type="ESCReal", n_blocks=10, exp_ratio=2)
    return base


def gen_esc_test():
    for variant, stem in [("", "ESC_DIV2K"), ("", "ESC_DFLIP"),
                          ("light", "ESC_light"), ("xl", "ESC_XL_DF2K"),
                          ("fp", "ESC_FP")]:
        for s in (2, 3, 4):
            name = f"{stem}_X{s}"
            opt = {
                "name": name, "model_type": "ESRModel", "scale": s,
                "num_gpu": 1, "manual_seed": 0,
                "datasets": esc_val_sets(s),
                "network_g": esc_net(s, variant),
                "path": {"pretrain_network_g": f"{PRETRAIN}/{name}.pth",
                         "param_key_g": "params_ema", "strict_load_g": True},
                "val": {"save_img": False, "suffix": None,
                        "metrics": psnr_ssim_metrics(s)},
            }
            dump(f"esc/test/{name}.yml",
                 f"{name} — ESC-family benchmark eval "
                 "(spec: HAT/ESC/options/test).", opt)

    # real-world: no-GT folders, save outputs only
    real_sets = {}
    for i, nm in enumerate(["DRealSR", "RealSR", "RealSRSet+5images",
                            "RealLQ250"], start=1):
        real_sets[f"test_{i}"] = {"name": nm, "type": "SingleImageDataset",
                                  "dataroot_lq": f"./datasets/{nm}/LR",
                                  "io_backend": {"type": "disk"}}
    opt = {"name": "ESC_Real_X4", "model_type": "ESRModel", "scale": 4,
           "num_gpu": 1, "manual_seed": 0, "datasets": real_sets,
           "network_g": esc_net(4, "real"),
           "path": {"pretrain_network_g": f"{PRETRAIN}/ESC_Real_X4_GAN.pth",
                    "param_key_g": "params_ema", "strict_load_g": True},
           "val": {"save_img": True, "suffix": None}}
    dump("esc/test/ESC_Real_X4.yml",
         "ESC_Real_X4 — real-world no-GT inference over result folders.", opt)

    # vendored-arch eval configs (ATD-light / HiT-SRF / SRFormer-light)
    atd = {"type": "ATD", "upscale": 0, "in_chans": 3, "img_size": 64,
           "embed_dim": 48, "depths": [6, 6, 6, 6], "num_heads": [4, 4, 4, 4],
           "window_size": 16, "category_size": 128, "num_tokens": 64,
           "reducted_dim": 8, "convffn_kernel_size": 7, "img_range": 1.0,
           "mlp_ratio": 1, "upsampler": "pixelshuffledirect",
           "resi_connection": "1conv"}
    hit = {"type": "HiT_SRF", "upscale": 0, "in_chans": 3, "img_size": 64,
           "base_win_size": [8, 8], "img_range": 1.0, "depths": [6, 6, 6, 6],
           "embed_dim": 60, "num_heads": [6, 6, 6, 6], "expansion_factor": 2,
           "resi_connection": "1conv",
           "hier_win_ratios": [0.5, 1, 2, 4, 6, 8],
           "upsampler": "pixelshuffledirect"}
    srf = {"type": "SRFormer", "upscale": 0, "in_chans": 3, "img_size": 64,
           "window_size": 16, "img_range": 1.0, "depths": [6, 6, 6, 6],
           "embed_dim": 60, "num_heads": [6, 6, 6, 6], "mlp_ratio": 2,
           "upsampler": "pixelshuffledirect", "resi_connection": "1conv"}
    for sub, stem, net, key in [("ATDLight", "ATD_light_DFLIP", atd,
                                 "params_ema"),
                                ("HiTSRF", "HiTSRF_DFLIP", hit, "params"),
                                ("SRFormerLight", "SRFormer_light_DFLIP",
                                 srf, "params")]:
        for s in (2, 3, 4):
            name = f"{stem}_X{s}"
            net_s = dict(net, upscale=s)
            opt = {"name": name, "model_type": "ESRModel", "scale": s,
                   "num_gpu": 1, "manual_seed": 0,
                   "datasets": esc_val_sets(s), "network_g": net_s,
                   "path": {"pretrain_network_g": f"{PRETRAIN}/{name}.pth",
                            "param_key_g": key, "strict_load_g": True},
                   "val": {"save_img": False, "suffix": None,
                           "metrics": psnr_ssim_metrics(s)}}
            dump(f"esc/test/{sub}/{name}.yml",
                 f"{name} — DFLIP-recipe benchmark eval.", opt)


def gen_esc_train():
    sched = {"type": "MultiStepLR",
             "milestones": [250000, 400000, 450000, 475000, 490000],
             "gamma": 0.5}
    adamw = {"type": "AdamW", "lr": 5.0e-4, "weight_decay": 0,
             "betas": [0.9, 0.9]}
    gt_by_scale = {2: 128, 3: 192, 4: 256}

    def train_block():
        return {"ema_decay": 0.999, "optim_g": dict(adamw),
                "scheduler": dict(sched), "total_iter": 500000,
                "warmup_iter": 20000,
                "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                              "reduction": "mean"}}

    for variant, stem in [("", "ESC_DIV2K"), ("", "ESC_DFLIP"),
                          ("light", "ESC_light"), ("fp", "ESC_FP")]:
        for s in (2, 3, 4):
            name = f"{stem}_X{s}"
            if "DFLIP" in stem:
                train_ds = {"name": "DFLIP", "type": "DownsampleImageDataset",
                            "dataroot_gt": "./datasets/DFLIP/GT",
                            "io_backend": {"type": "disk"}}
            else:
                train_ds = {"name": "DIV2K", "type": "PairedImageDataset",
                            "dataroot_gt":
                                "./datasets/DIV2K/DIV2K_train_HR_sub",
                            "dataroot_lq": f"./datasets/DIV2K/X{s}_sub",
                            "filename_tmpl": "{}",
                            "io_backend": {"type": "disk"}}
            train_ds.update(gt_size=gt_by_scale[s], use_hflip=True,
                            use_rot=True, batch_size_per_gpu=16,
                            dataset_enlarge_ratio=1)
            # x3/x4 warm-start from the family's x2 checkpoint
            pre = None if s == 2 else f"{PRETRAIN}/{stem}_X2.pth"
            path = {"pretrain_network_g": pre, "strict_load_g": True,
                    "resume_state": None}
            if pre:
                path["param_key_g"] = "params_ema"
            opt = {"name": name, "model_type": "ESRModel", "scale": s,
                   "num_gpu": "auto", "manual_seed": 0,
                   "datasets": {"train": train_ds,
                                **esc_val_sets(s, phase="val")},
                   "network_g": esc_net(s, variant), "path": path,
                   "train": train_block(),
                   "val": {"val_freq": 5000.0, "save_img": False,
                           "metrics": psnr_ssim_metrics(s)},
                   "logger": {"print_freq": 100,
                              "save_checkpoint_freq": 5000.0,
                              "use_tb_logger": True}}
            dump(f"esc/train/{name}.yml",
                 f"{name} — ESC-family training recipe "
                 "(spec: HAT/ESC/options/train).", opt)

    # real-world pair: MSE pretrain then GAN finetune
    degr_first = {"resize_prob": [0.2, 0.7, 0.1], "resize_range": [0.15, 1.5],
                  "gaussian_noise_prob": 0.5, "noise_range": [1, 30],
                  "poisson_scale_range": [0.05, 3], "gray_noise_prob": 0.4,
                  "jpeg_range": [30, 95]}
    degr_second = {"second_blur_prob": 0.8, "resize_prob2": [0.3, 0.4, 0.3],
                   "resize_range2": [0.3, 1.2], "gaussian_noise_prob2": 0.5,
                   "noise_range2": [1, 25], "poisson_scale_range2": [0.05, 2.5],
                   "gray_noise_prob2": 0.4, "jpeg_range2": [30, 95]}
    kernels = {"blur_kernel_size": 21,
               "kernel_list": ["iso", "aniso", "generalized_iso",
                               "generalized_aniso", "plateau_iso",
                               "plateau_aniso"],
               "kernel_prob": [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
               "sinc_prob": 0.1, "blur_sigma": [0.2, 3],
               "betag_range": [0.5, 4], "betap_range": [1, 2],
               "blur_kernel_size2": 21,
               "kernel_list2": ["iso", "aniso", "generalized_iso",
                                "generalized_aniso", "plateau_iso",
                                "plateau_aniso"],
               "kernel_prob2": [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
               "sinc_prob2": 0.1, "blur_sigma2": [0.2, 1.5],
               "betag_range2": [0.5, 4], "betap_range2": [1, 2],
               "final_sinc_prob": 0.8}
    real_train_ds = {"name": "DF2KOST", "type": "RealESRGANDataset",
                     "dataroot_gt": "./datasets/DF2KMultiscaleOST",
                     "io_backend": {"type": "disk"}, **kernels,
                     "gt_size": 256, "use_hflip": True, "use_rot": False,
                     "batch_size_per_gpu": 12, "dataset_enlarge_ratio": 1}

    mse = {"name": "ESC_Real_X4_MSE", "model_type": "RealHATMSEModel",
           "scale": 4, "num_gpu": "auto", "manual_seed": 0, "gt_usm": True,
           **degr_first, **degr_second, "gt_size": 256, "queue_size": 180,
           "datasets": {"train": real_train_ds},
           "network_g": esc_net(4, "real"),
           "path": {"pretrain_network_g": None, "strict_load_g": True,
                    "resume_state": None},
           "train": {"ema_decay": 0.999,
                     "optim_g": {"type": "AdamW", "lr": 5.0e-4,
                                 "weight_decay": 0, "betas": [0.9, 0.9]},
                     "scheduler": {"type": "MultiStepLR",
                                   "milestones": [100000], "gamma": 0.4},
                     "total_iter": 1000000, "warmup_iter": -1,
                     "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                   "reduction": "mean"}},
           "logger": {"print_freq": 200, "save_checkpoint_freq": 10000.0,
                      "use_tb_logger": True}}
    dump("esc/train/ESC_Real_X4_MSE.yml",
         "ESC_Real_X4_MSE — real-world MSE pretrain with the on-device "
         "2nd-order degradation pipeline.", mse)

    gan = {"name": "ESC_Real_X4_GAN", "model_type": "RealHATGANModel",
           "scale": 4, "num_gpu": "auto", "manual_seed": 0,
           "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
           **degr_first, **degr_second, "gt_size": 256, "queue_size": 180,
           "datasets": {"train": real_train_ds,
                        "val": {"name": "validation",
                                "type": "SingleImageDataset",
                                "dataroot_lq": "./datasets/RealSRSet+5images",
                                "io_backend": {"type": "disk"}}},
           "network_g": esc_net(4, "real"),
           "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                         "num_feat": 64, "skip_connection": True},
           "path": {"pretrain_network_g": f"{PRETRAIN}/ESC_Real_X4_MSE.pth",
                    "param_key_g": "params_ema", "strict_load_g": True,
                    "resume_state": None},
           "train": {"ema_decay": 0.999,
                     "optim_g": {"type": "Adam", "lr": 1.0e-4,
                                 "weight_decay": 0, "betas": [0.9, 0.99]},
                     "optim_d": {"type": "Adam", "lr": 1.0e-4,
                                 "weight_decay": 0, "betas": [0.9, 0.99]},
                     "scheduler": {"type": "MultiStepLR",
                                   "milestones": [400000], "gamma": 0.5},
                     "total_iter": 400000, "warmup_iter": -1,
                     "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                   "reduction": "mean"},
                     "perceptual_opt": {
                         "type": "PerceptualLoss",
                         "layer_weights": {"conv1_2": 0.1, "conv2_2": 0.1,
                                           "conv3_4": 1, "conv4_4": 1,
                                           "conv5_4": 1},
                         "vgg_type": "vgg19", "use_input_norm": True,
                         "perceptual_weight": 1.0, "style_weight": 0,
                         "range_norm": False, "criterion": "l1"},
                     "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                                 "real_label_val": 1.0, "fake_label_val": 0.0,
                                 "loss_weight": 0.1},
                     "net_d_iters": 1, "net_d_init_iters": 0},
           "logger": {"print_freq": 200, "save_checkpoint_freq": 10000.0,
                      "use_tb_logger": True}}
    dump("esc/train/ESC_Real_X4_GAN.yml",
         "ESC_Real_X4_GAN — real-world GAN finetune from the MSE model.", gan)


# --------------------------------------------------------------- HAT family

def hat_net(scale: int, size: str) -> dict:
    """size: '' (base), 'L' (12 RHAGs), 'S' (embed 144, ratios 24)."""
    depths = [6] * (12 if size == "L" else 6)
    net = {"type": "HAT", "upscale": scale, "in_chans": 3, "img_size": 64,
           "window_size": 16, "compress_ratio": 3, "squeeze_factor": 30,
           "conv_scale": 0.01, "overlap_ratio": 0.5, "img_range": 1.0,
           "depths": depths, "embed_dim": 180, "num_heads": [6] * len(depths),
           "mlp_ratio": 2, "upsampler": "pixelshuffle",
           "resi_connection": "1conv"}
    if size == "S":
        net.update(compress_ratio=24, squeeze_factor=24, embed_dim=144)
    return net


def hat_val_set(scale: int) -> dict:
    return {"name": "Set5", "type": "PairedImageDataset",
            "dataroot_gt": "./datasets/Set5/GTmod4",
            "dataroot_lq": f"./datasets/Set5/LRbicx{scale}",
            "io_backend": {"type": "disk"}}


def gen_hat_imagenet():
    gt_by_scale = {2: 128, 3: 192, 4: 256}

    # test configs for the ImageNet-pretrained checkpoints
    for s in (2, 3, 4):
        name = f"HAT_SRx{s}_ImageNet-pretrain"
        opt = {"name": name, "model_type": "HATModel", "scale": s,
               "num_gpu": 1, "manual_seed": 0,
               "datasets": {"test_1": {
                   "name": "Set5", "type": "PairedImageDataset",
                   "dataroot_gt": f"./datasets/Set5/GTmod{s}",
                   "dataroot_lq": f"./datasets/Set5/LRbicx{s}",
                   "io_backend": {"type": "disk"}}},
               "network_g": hat_net(s, ""),
               "path": {"pretrain_network_g": f"{PRETRAIN}/{name}.pth",
                        "strict_load_g": True, "param_key_g": "params_ema"},
               "val": {"save_img": True, "suffix": None,
                       "metrics": psnr_ssim_metrics(s)}}
        dump(f"test/{name}.yml",
             f"{name} — eval with the ImageNet-pretrained checkpoint.", opt)

    def train_opt(name, scale, size, datasets, path, lr, milestones,
                  total_iter, val_freq, ema=0.999):
        return {"name": name, "model_type": "HATModel", "scale": scale,
                "num_gpu": "auto", "manual_seed": 0, "datasets": datasets,
                "network_g": hat_net(scale, size),
                "path": path,
                "train": {"ema_decay": ema,
                          "optim_g": {"type": "Adam", "lr": lr,
                                      "weight_decay": 0, "betas": [0.9, 0.99]},
                          "scheduler": {"type": "MultiStepLR",
                                        "milestones": milestones,
                                        "gamma": 0.5},
                          "total_iter": total_iter, "warmup_iter": -1,
                          "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                        "reduction": "mean"}},
                "val": {"val_freq": val_freq, "save_img": False,
                        "metrics": psnr_ssim_metrics(scale)},
                "logger": {"print_freq": 100,
                           "save_checkpoint_freq": 5000.0,
                           "use_tb_logger": True}}

    for size in ("", "L"):
        tag = f"HAT-{size}" if size else "HAT"
        for s in (2, 3, 4):
            gt = gt_by_scale[s]
            # stage 1: ImageNet pretrain from scratch (800k iters)
            name = f"train_{tag}_SRx{s}_ImageNet_from_scratch"
            imnet = {"train": {
                "name": "ImageNet", "type": "ImageNetPairedDataset",
                "dataroot_gt": "./datasets/ImageNet/GT",
                "meta_info_file": "./datasets/meta_info/"
                                  "meta_info_ImageNet_GT.txt",
                "io_backend": {"type": "disk"}, "gt_size": gt,
                "use_hflip": True, "use_rot": True, "batch_size_per_gpu": 4,
                "dataset_enlarge_ratio": 1}, "val": hat_val_set(s)}
            dump(f"train/{name}.yml",
                 f"{name} — stage-1 ImageNet pretraining "
                 "(spec: HAT/options/train).",
                 train_opt(name, s, size, imnet,
                           {"pretrain_network_g": None,
                            "strict_load_g": True, "resume_state": None},
                           2.0e-4, [300000, 500000, 650000, 700000, 750000],
                           800000, 10000.0))

            # stage 2: DF2K finetune from the ImageNet checkpoint (250k)
            name2 = f"train_{tag}_SRx{s}_finetune_from_ImageNet_pretrain"
            df2k = {"train": {
                "name": "DF2K", "type": "PairedImageDataset",
                "dataroot_gt": "./datasets/DF2K/DF2K_HR_sub",
                "dataroot_lq": f"./datasets/DF2K/DF2K_bicx{s}_sub",
                "meta_info_file": "./datasets/meta_info/"
                                  "meta_info_DF2Ksub_GT.txt",
                "io_backend": {"type": "disk"}, "gt_size": gt,
                "use_hflip": True, "use_rot": True, "batch_size_per_gpu": 4,
                "dataset_enlarge_ratio": 1}, "val": hat_val_set(s)}
            dump(f"train/{name2}.yml",
                 f"{name2} — stage-2 finetune from the ImageNet pretrain.",
                 train_opt(name2, s, size, df2k,
                           {"pretrain_network_g":
                                f"./experiments/{name}/models/net_g_latest",
                            "param_key_g": "params_ema",
                            "strict_load_g": True, "resume_state": None},
                           1.0e-5, [125000, 200000, 225000, 240000],
                           250000, 5000.0))

    # x4 warm-started from the trained x2 model (base + S sizes)
    for size, strict in [("", True), ("S", False)]:
        tag = f"HAT-{size}" if size else "HAT"
        name = f"train_{tag}_SRx4_finetune_from_SRx2"
        df2k = {"train": {
            "name": "DF2K", "type": "PairedImageDataset",
            "dataroot_gt": "./datasets/DF2K/DF2K_HR_sub",
            "dataroot_lq": "./datasets/DF2K/DF2K_bicx4_sub",
            "meta_info_file": "./datasets/meta_info/meta_info_DF2Ksub_GT.txt",
            "io_backend": {"type": "disk"}, "gt_size": 256,
            "use_hflip": True, "use_rot": True, "batch_size_per_gpu": 4,
            "dataset_enlarge_ratio": 1}, "val": hat_val_set(4)}
        path = {"pretrain_network_g":
                    f"./experiments/train_{tag}_SRx2_from_scratch/models/"
                    "net_g_latest",
                "strict_load_g": strict, "resume_state": None}
        if strict:
            path["param_key_g"] = "params_ema"
        dump(f"train/{name}.yml",
             f"{name} — x4 warm-started from the x2 run (the x2 upsampler "
             "stage is re-initialized when strict_load is off).",
             train_opt(name, 4, size, df2k, path, 1.0e-4,
                       [125000, 200000, 225000, 240000], 250000,
                       20000.0 if size == "S" else 5000.0))

    # HATX with ESC-infused OCAB (spec: train_HAT_SRx2_ESC_OCAB_from_scratch)
    name = "train_HAT_SRx2_ESC_OCAB_from_scratch"
    hatx = {"type": "HATX", "upscale": 2, "in_chans": 3, "img_size": 64,
            "window_size": 16, "compress_ratio": 3, "squeeze_factor": 30,
            "conv_scale": 0.03, "overlap_ratio": 0.6, "img_range": 1.0,
            "depths": [6] * 6, "embed_dim": 180, "num_heads": [6] * 6,
            "hab_ffn_ratio": 3.0, "mlp_ratio": 4.0,
            "upsampler": "pixelshuffle", "resi_connection": "1conv",
            "esc_pdim": 24, "esc_kernel": 15, "ocab_esc_enable": True,
            "ocab_esc_pdim": 32, "ocab_esc_kernel": 17,
            "kv_topk_ratio": 0.6, "use_focus_bias": True}
    df2k = {"train": {
        "name": "DF2K", "type": "PairedImageDataset",
        "dataroot_gt": "./datasets/DF2K/DF2K_HR_sub",
        "dataroot_lq": "./datasets/DF2K/DF2K_LR_bicubic/X2_sub",
        "meta_info_file": "./datasets/meta_info/meta_info_DF2Ksub_GT.txt",
        "io_backend": {"type": "disk"}, "gt_size": 128, "use_hflip": True,
        "use_rot": True, "batch_size_per_gpu": 2, "dataset_enlarge_ratio": 1},
        "val": hat_val_set(2)}
    opt = {"name": name, "model_type": "HATModel", "scale": 2,
           "num_gpu": "auto", "manual_seed": 0, "datasets": df2k,
           "network_g": hatx,
           "path": {"pretrain_network_g": None, "strict_load_g": True,
                    "resume_state": None},
           "train": {"ema_decay": 0.9995,
                     "optim_g": {"type": "Adam", "lr": 2.0e-4,
                                 "weight_decay": 0, "betas": [0.9, 0.99]},
                     "scheduler": {"type": "MultiStepLR",
                                   "milestones": [250000, 400000, 450000,
                                                  475000],
                                   "gamma": 0.5},
                     "total_iter": 500000, "warmup_iter": -1,
                     "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                                   "reduction": "mean"}},
           "val": {"val_freq": 5000.0, "save_img": True,
                   "tile": {"tile_size": 64, "tile_pad": 16},
                   "metrics": psnr_ssim_metrics(2)},
           "logger": {"print_freq": 100, "save_checkpoint_freq": 5000.0,
                      "use_tb_logger": True}}
    dump(f"train/{name}.yml",
         f"{name} — HATX (focus bias + top-k kv + ESC-infused OCAB) PSNR "
         "recipe; validates in tile mode.", opt)


# --------------------------------------------------------------- arb family

ARB_BENCH_ROOTS = {
    "set5": "Set5", "set14": "Set14", "b100": "B100", "urban100": "Urban100",
}


def gen_arb():
    # -------- training
    mlp4 = {"name": "mlp", "args": {"out_dim": 3,
                                    "hidden_list": [256, 256, 256, 256]}}
    mlp3 = {"name": "mlp", "args": {"out_dim": 3,
                                    "hidden_list": [256, 256, 256]}}

    def head(kind, encoder, enc_args, big=False):
        enc = {"name": encoder, "args": enc_args}
        if kind == "liif":
            return {"name": "liif", "args": {"encoder_spec": enc,
                                             "imnet_spec": dict(mlp4)}}
        if kind == "lte":
            return {"name": "lte", "args": {"encoder_spec": enc,
                                            "imnet_spec": dict(mlp3),
                                            "hidden_dim": 256}}
        if kind == "lte-fast":
            return {"name": "lte-fast", "args": {"encoder_spec": enc,
                                                 "num_layer": 3,
                                                 "hidden_dim": 256,
                                                 "out_dim": 3}}
        if kind == "metasr":
            return {"name": "metasr", "args": {"encoder_spec": enc}}
        raise ValueError(kind)

    # (file stem, head kind, encoder, enc args, inp, bs, lr, milestones)
    small_ms = [200, 400, 600, 800]
    big_ms = [500, 800, 900, 950]
    recipes = [
        ("train_edsr-baseline-liif", "liif", "edsr-baseline",
         {"no_upsampling": True}, 48, 16, 1e-4, small_ms),
        ("train_edsr-baseline-lte", "lte", "edsr-baseline",
         {"no_upsampling": True}, 48, 16, 1e-4, small_ms),
        ("train_edsr-baseline-lte-fast", "lte-fast", "edsr-baseline",
         {"no_upsampling": True}, 48, 16, 1e-4, small_ms),
        ("train_edsr-baseline-metasr", "metasr", "edsr-baseline",
         {"no_upsampling": True}, 48, 16, 1e-4, small_ms),
        ("train_rdn-liif", "liif", "rdn", {"no_upsampling": True},
         48, 16, 1e-4, small_ms),
        ("train_rdn-lte", "lte", "rdn", {"no_upsampling": True},
         48, 16, 1e-4, small_ms),
        ("train_rdn-metasr", "metasr", "rdn", {"no_upsampling": True},
         48, 16, 1e-4, small_ms),
        ("train_swinir-liif", "liif", "swinir", {"no_upsampling": True},
         48, 16, 1e-4, small_ms),
        ("train_swinir-lte", "lte", "swinir", {"no_upsampling": True},
         48, 32, 2e-4, big_ms),
        ("train_swinir-metasr", "metasr", "swinir", {"no_upsampling": True},
         48, 16, 1e-4, small_ms),
        ("train_esc-lte", "lte", "esc", {"no_upsampling": True},
         64, 32, 2e-4, big_ms),
        ("train_atd-lte", "lte", "ATDLight", {"no_upsampling": True},
         64, 32, 2e-4, big_ms),
        ("train_hitsrf-lte", "lte", "HiTSRF", {"no_upsampling": True},
         64, 32, 2e-4, big_ms),
    ]
    # fixed-scale baselines: full encoder (with upsampler) under a LIIF head
    for enc in ("edsr-baseline", "rdn"):
        for s in (2, 3, 4):
            recipes.append((f"train_{enc}-x{s}", "liif", enc, {"scale": s},
                            48, 16, 1e-4, small_ms))

    for stem, kind, enc, enc_args, inp, bs, lr, ms in recipes:
        sample_q = None if kind == "lte-fast" else 2304
        train_ds = {"type": "SRImplicitDownsampled",
                    "dataset": {"type": "DownsampleImageDataset",
                                "dataroot_gt":
                                    "./datasets/DIV2K/DIV2K_train_HR",
                                "scale": 2, "phase": "train"},
                    "inp_size": inp, "scale_min": 1, "scale_max": 4,
                    "augment": True, "batch_size": bs}
        if sample_q:
            train_ds["sample_q"] = sample_q
        opt = {"model": head(kind, enc, enc_args),
               "train_dataset": train_ds,
               "val_dataset": {"type": "SRImplicitDownsampled",
                               "dataset": {"type": "DownsampleImageDataset",
                                           "dataroot_gt":
                                               "./datasets/DIV2K/"
                                               "DIV2K_valid_HR",
                                           "scale": 2, "phase": "train"},
                               "inp_size": inp, "scale_min": 1,
                               "scale_max": 4,
                               **({"sample_q": sample_q} if sample_q else {}),
                               "batch_size": bs},
               "optimizer": {"lr": lr},
               "epoch_max": 1000,
               "multi_step_lr": {"milestones": ms, "gamma": 0.5},
               "epoch_val": 1, "epoch_save": 100}
        dump(f"arb/train-div2k/{stem}.yml",
             f"{stem} — arbitrary-scale training recipe "
             "(spec: HAT/ESC/esc_arb/configs/train-div2k).", opt)

    # -------- testing: benchmark sets x scales (+DIV2K valid), fast variants
    def test_cfg(scale, root_lq, root_gt, eval_type, bsize):
        # in-distribution scales have shipped LR folders (paired); larger
        # ones synthesize LQ on the fly like the reference wrapper
        if scale <= 4:
            test_ds = {"type": "SRImplicitPaired",
                       "dataset": {"type": "PairedImageDataset",
                                   "dataroot_gt": root_gt,
                                   "dataroot_lq": root_lq,
                                   "filename_tmpl": "{}" + f"x{scale}",
                                   "io_backend": {"type": "disk"}},
                       "batch_size": 1}
        else:
            test_ds = {"type": "SRImplicitDownsampled",
                       "dataset": {"type": "DownsampleImageDataset",
                                   "dataroot_gt": root_gt,
                                   "scale": scale, "phase": "val"},
                       "scale_min": scale, "scale_max": scale,
                       "batch_size": 1}
        return {"test_dataset": test_ds, "eval_type": eval_type,
                "eval_bsize": bsize}

    for fast in (False, True):
        prefix = "test-fast-" if fast else "test-"
        for key, folder in ARB_BENCH_ROOTS.items():
            for s in (2, 3, 4, 6, 8):
                stem = f"{prefix}{key}-{s}"
                cfg = test_cfg(s, f"./datasets/{folder}/LR_bicubic/X{s}",
                               f"./datasets/{folder}/HR",
                               f"benchmark-{s}", 300000)
                if fast:
                    cfg["fast_eval"] = True  # full-grid query, no chunking
                dump(f"arb/test/{stem}.yml",
                     f"{stem} — arbitrary-scale benchmark eval.", cfg)
        for s in (2, 3, 4, 6, 12, 18, 24, 30):
            stem = f"{prefix}div2k-{s}"
            cfg = test_cfg(s, f"./datasets/DIV2K/LR_bicubic/X{s}",
                           "./datasets/DIV2K/DIV2K_valid_HR",
                           f"div2k-{s}", 500000)
            if fast:
                cfg["fast_eval"] = True
            dump(f"arb/test/{stem}.yml",
                 f"{stem} — DIV2K-validation arbitrary-scale eval.", cfg)


if __name__ == "__main__":
    gen_esc_test()
    gen_esc_train()
    gen_hat_imagenet()
    gen_arb()
    n = sum(len(fs) for _, _, fs in os.walk(osp.join(ROOT, "options")))
    print(f"options/ now holds {n} files")
