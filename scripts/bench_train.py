"""Training-step throughput for classic HAT SRx4 on one chip.

Measures the jitted L1+Adam+EMA train step (runtime/train_loop.py::
make_sr_train_step) at the reference recipe's shapes — GT 256 / LQ 64,
batch 4 per device (reference trains batch 4/GPU at ~20 GB,
HAT/README.md:109) — across three configs:

  f32         the plain step
  amp         train.use_amp (bf16 compute, f32 master params/opt — the
              TPU analog of ESRModel's autocast, esr_model.py:214-256)
  amp+remat   use_amp + network use_checkpoint (nn.remat per RHAG; the
              reference honors use_checkpoint at hatx_arch.py:546-551)

BENCH_TRAIN_BATCH overrides the batch size (e.g. probing the OOM
boundary per variant: remat trades ~depth x activation memory for one
extra forward). BENCH_ARCH=fork benches the fork HAT.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.runtime.train_loop import (
    build_optimizer, init_train_state, make_sr_train_step)

scale = 4
lq_hw = 64
batch = int(os.environ.get("BENCH_TRAIN_BATCH", 4))
arch = os.environ.get("BENCH_ARCH", "classic")
kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
          window_size=16, compress_ratio=3, squeeze_factor=30,
          conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0, upscale=scale,
          upsampler="pixelshuffle", drop_path_rate=0.1)

def build(use_checkpoint):
    if arch == "classic":
        from super_resolution_tpu.models.hat_classic_arch import HATClassic
        return HATClassic(use_checkpoint=use_checkpoint, **kw)
    from super_resolution_tpu.models.hat_arch import HAT
    return HAT(use_checkpoint=use_checkpoint, **kw)

# reference train recipe (options/train/train_HAT_SRx4_from_scratch.yml)
topt = {"pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
        "ema_decay": 0.999,
        "optim_g": {"type": "Adam", "lr": 2e-4, "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR",
                      "milestones": [300000, 500000, 650000, 700000],
                      "gamma": 0.5},
        "total_iter": 800000}

rng = np.random.default_rng(0)
batch_data = {
    "lq": jnp.asarray(rng.random((batch, lq_hw, lq_hw, 3)), jnp.float32),
    "gt": jnp.asarray(rng.random((batch, lq_hw * scale, lq_hw * scale, 3)),
                      jnp.float32),
}
init_net = build(False)
params = init_net.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, lq_hw, lq_hw, 3)))["params"]
key = jax.random.PRNGKey(1)

sel = os.environ.get("BENCH_TRAIN_VARIANTS", "f32,amp,amp+remat").split(",")
for name, amp, ckpt in (("f32", False, False), ("amp", True, False),
                        ("amp+remat", True, True)):
    if name not in sel:
        continue
    net = build(ckpt)
    tx, _ = build_optimizer(dict(topt, use_amp=amp), {})
    step = jax.jit(make_sr_train_step(net, tx, dict(topt, use_amp=amp)))
    state = init_train_state(params, tx, topt["ema_decay"])
    state, logs = step(state, batch_data, key)          # compile
    float(logs["l_pix"])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, logs = step(state, batch_data, key)
    float(logs["l_pix"])                                # drain the chain
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:10s}: {dt*1e3:7.1f} ms/step  "
          f"{batch/dt:6.2f} samples/s  "
          f"{batch*lq_hw*lq_hw/1e6/dt:6.3f} in-Mpix/s  "
          f"(batch {batch}, loss {float(logs['l_pix']):.4f})")
