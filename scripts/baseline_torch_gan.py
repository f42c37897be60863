"""Measure the reference's Real-HAT-GAN train-step time on torch CPU.

Instantiates the reference's own RealHATGANModel (hat/models/
realhatgan_model.py — on-GPU 2nd-order degradation feed_data + G/D
alternation optimize_parameters) with num_gpu: 0 and runs full steps at
the recipe shapes our bench GAN leg uses (scripts/bench_gan.py: fork-HAT
G, UNetDiscriminatorSN, L1 + vanilla GAN, no perceptual — no VGG weights
are mounted — GT 256 x4, batch 4). The measured samples/s is hardcoded
into bench.py as BASELINE_GAN_SAMPLES_S (same offline-anchor protocol as
the inference and train legs).

The reference hardcodes .cuda() on DiffJPEG/USMSharp/queue tensors
(realhatgan_model.py:25-43); those are no-op'd so the identical code runs
on CPU. Nothing is copied; the reference executes as-is.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from reference_oracle import get_hat_model  # noqa: E402

import torch  # noqa: E402

torch.manual_seed(0)
torch.nn.Module.cuda = lambda self, *a, **k: self
torch.Tensor.cuda = lambda self, *a, **k: self

get_hat_model()  # installs stubs + registry factories + registers HAT

import hat.archs.discriminator_arch  # noqa: E402,F401  (registers UNet-SN)
import basicsr.losses.basic_loss  # noqa: E402,F401  (registers L1Loss)
import basicsr.losses.gan_loss  # noqa: E402,F401  (registers GANLoss)
from hat.models.realhatgan_model import RealHATGANModel  # noqa: E402

scale, gt_size = 4, 256
batch = int(os.environ.get("BASE_GAN_BATCH", 4))
opt = {
    "name": "gan_baseline", "model_type": "RealHATGANModel", "scale": scale,
    "num_gpu": 0, "manual_seed": 0, "is_train": True, "dist": False,
    "rank": 0, "world_size": 1,
    "gt_size": gt_size, "queue_size": 16 * batch,
    "resize_prob": [0.2, 0.7, 0.1], "resize_range": [0.15, 1.5],
    "gaussian_noise_prob": 0.5, "noise_range": [1, 30],
    "poisson_scale_range": [0.05, 3.0], "gray_noise_prob": 0.4,
    "jpeg_range": [30, 95],
    "second_blur_prob": 0.8,
    "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.2],
    "gaussian_noise_prob2": 0.5, "noise_range2": [1, 25],
    "poisson_scale_range2": [0.05, 2.5], "gray_noise_prob2": 0.4,
    "jpeg_range2": [30, 95],
    "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
    "network_g": {"type": "HAT", "upscale": scale, "in_chans": 3,
                  "img_size": 64, "window_size": 16, "compress_ratio": 3,
                  "squeeze_factor": 30, "conv_scale": 0.01,
                  "overlap_ratio": 0.5, "img_range": 1.0,
                  "depths": [6] * 6, "embed_dim": 180,
                  "num_heads": [6] * 6, "mlp_ratio": 2,
                  "upsampler": "pixelshuffle", "resi_connection": "1conv"},
    "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                  "num_feat": 64},
    "path": {"pretrain_network_g": None, "pretrain_network_d": None,
             "strict_load_g": True},
    "train": {
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 1e-4, "weight_decay": 0,
                    "betas": [0.9, 0.99]},
        "optim_d": {"type": "Adam", "lr": 1e-4, "weight_decay": 0,
                    "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                      "gamma": 0.5},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                      "reduction": "mean"},
        "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                    "real_label_val": 1.0, "fake_label_val": 0.0,
                    "loss_weight": 0.1},
        "net_d_iters": 1, "net_d_init_iters": 0,
    },
}

# the reference's filter2D .view()s F.pad's output, which is
# non-contiguous on this CPU torch build (works on CUDA); same batched
# grouped-conv semantics with reshape instead
import torch.nn.functional as F  # noqa: E402
import hat.models.realhatgan_model as _rhm  # noqa: E402


def _filter2d_cpu(img, kernel):
    k = kernel.size(-1)
    b, c, h, w = img.size()
    img = F.pad(img, (k // 2,) * 4, mode="reflect").reshape(1, b * c, -1, w + k - 1)
    kernel = kernel.view(b, 1, k, k).repeat(1, c, 1, 1).reshape(b * c, 1, k, k)
    return F.conv2d(img, kernel, groups=b * c).view(b, c, h, w)


_rhm.filter2D = _filter2d_cpu

model = RealHATGANModel(opt)
rng = torch.Generator().manual_seed(1)
k = torch.rand(batch, 21, 21, generator=rng)
k = k / k.sum(dim=(1, 2), keepdim=True)
data = {"gt": torch.rand(batch, 3, 400, 400, generator=rng),
        "kernel1": k, "kernel2": k.clone(), "sinc_kernel": k.clone()}


def step(it):
    model.feed_data(data)
    model.optimize_parameters(it)


print("warmup step...", flush=True)
t0 = time.time()
step(1)
print(f"warmup {time.time() - t0:.1f}s", flush=True)
times = []
for i in range(2):
    t0 = time.perf_counter()
    step(i + 2)
    times.append(time.perf_counter() - t0)
    print(f"step {i}: {times[-1]:.1f}s", flush=True)
import numpy as np  # noqa: E402

dt = float(np.median(times))
print(f"BASELINE_GAN_SAMPLES_S = {batch / dt:.4f}  "
      f"({dt:.1f} s/step, batch {batch}, torch {torch.__version__} CPU)")
