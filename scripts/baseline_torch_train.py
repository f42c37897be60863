"""Measure the reference's train-step time on torch CPU (the bench anchor).

Runs the reference's own fork-HAT (hat/archs/hat_arch.py) through one
reference-recipe training step — L1 loss + Adam(2e-4, betas 0.9/0.99) +
EMA 0.999, batch 4, GT 256 / LQ 64 x4 (options/train/
train_HAT_SRx4_from_scratch.yml; the reference trains batch 4/GPU,
HAT/README.md:109) — exactly the work SRModel.optimize_parameters +
model_ema does per iteration (basicsr/models/sr_model.py:92-119,
base_model.py:75-82), on this machine's CPU. The measured samples/s is
hardcoded into bench.py as BASELINE_TRAIN_SAMPLES_S (same offline-anchor
protocol as the inference leg's BASELINE_LOCAL_OUT_MPIX_S).

Nothing is copied from the reference; its modules are executed as-is
(tests/reference_oracle.py stubs the absent torchvision/timm imports).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from reference_oracle import install_stubs  # noqa: E402

install_stubs()
sys.path.insert(0, "/root/reference/HAT")
sys.path.insert(0, "/root/reference/HAT/ESC")

import torch  # noqa: E402

torch.manual_seed(0)

from hat.archs.hat_arch import HAT as RefHAT  # noqa: E402

scale = 4
batch = int(os.environ.get("BASE_TRAIN_BATCH", 4))
# reference recipe dims (options/train/train_HAT_SRx4_from_scratch.yml)
net = RefHAT(upscale=scale, in_chans=3, img_size=64, window_size=16,
             compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
             overlap_ratio=0.5, img_range=1.0, depths=[6] * 6,
             embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
             upsampler="pixelshuffle", resi_connection="1conv")
net.train()
ema = RefHAT(upscale=scale, in_chans=3, img_size=64, window_size=16,
             compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
             overlap_ratio=0.5, img_range=1.0, depths=[6] * 6,
             embed_dim=180, num_heads=[6] * 6, mlp_ratio=2,
             upsampler="pixelshuffle", resi_connection="1conv")
ema.load_state_dict(net.state_dict())
for p in ema.parameters():
    p.requires_grad_(False)

opt = torch.optim.Adam(net.parameters(), lr=2e-4, betas=(0.9, 0.99))
crit = torch.nn.L1Loss()
lq = torch.rand(batch, 3, 64, 64)
gt = torch.rand(batch, 3, 256, 256)


def step():
    opt.zero_grad()
    out = net(lq)
    loss = crit(out, gt)
    loss.backward()
    opt.step()
    # model_ema decay 0.999 (base_model.py:75-82)
    with torch.no_grad():
        for pe, p in zip(ema.parameters(), net.parameters()):
            pe.mul_(0.999).add_(p, alpha=0.001)
    return float(loss)


print("warmup step...", flush=True)
t0 = time.time()
step()
print(f"warmup {time.time() - t0:.1f}s", flush=True)
times = []
for i in range(2):
    t0 = time.perf_counter()
    step()
    times.append(time.perf_counter() - t0)
    print(f"step {i}: {times[-1]:.1f}s", flush=True)
import numpy as np  # noqa: E402

dt = float(np.median(times))
print(f"BASELINE_TRAIN_SAMPLES_S = {batch / dt:.4f}  "
      f"({dt:.1f} s/step, batch {batch}, torch {torch.__version__} CPU)")
