"""Real-HAT-GAN training-step throughput on one chip.

The full real-world pipeline per step (reference protocol:
realhatgan_model.py feed_data + optimize_parameters): on-device
2nd-order degradation synthesis (USM, blur, random resize, gauss/
poisson noise, DiffJPEG, sinc), pair-pool shuffle, G step (L1 + vanilla
GAN vs the spectral-norm U-Net discriminator), D step (real/fake), EMA.
Reference recipe shapes: GT 256 x4, batch 4. The VGG19 perceptual term
is excluded (no pretrained weights are mounted in this environment —
its cost is one VGG forward + backward on the 256px pair).

BENCH_GAN_BATCH overrides batch size.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # already set by a caller (bench.py imports measure())
    pass

scale, gt = 4, 256
batch = int(os.environ.get("BENCH_GAN_BATCH", 4))
opt = {
    "name": "gan_bench", "model_type": "RealHATGANModel", "scale": scale,
    "num_gpu": 1, "manual_seed": 0, "is_train": True,
    # degradation config = the reference Real-HAT-GAN recipe
    # (train_HAT_GAN_Real_SRx4 yml family)
    "gt_size": gt,
    "resize_prob": [0.2, 0.7, 0.1], "resize_range": [0.15, 1.5],
    "gaussian_noise_prob": 0.5, "noise_range": [1, 30],
    "poisson_scale_range": [0.05, 3.0], "gray_noise_prob": 0.4,
    "jpeg_range": [30, 95],
    "second_blur_prob": 0.8,
    "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.2],
    "gaussian_noise_prob2": 0.5, "noise_range2": [1, 25],
    "poisson_scale_range2": [0.05, 2.5], "gray_noise_prob2": 0.4,
    "jpeg_range2": [30, 95],
    "queue_size": 16 * batch,
    "l1_gt_usm": True, "percep_gt_usm": True, "gan_gt_usm": False,
    "network_g": {"type": "HAT", "img_size": 64, "embed_dim": 180,
                  "depths": [6] * 6, "num_heads": [6] * 6,
                  "window_size": 16, "compress_ratio": 3,
                  "squeeze_factor": 30, "conv_scale": 0.01,
                  "overlap_ratio": 0.5, "mlp_ratio": 2.0, "upscale": scale,
                  "upsampler": "pixelshuffle", "use_checkpoint": True},
    "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                  "num_feat": 64},
    "datasets": {"train": {"name": "x", "type": "PairedImageDataset",
                           "phase": "train", "gt_size": gt}},
    "train": {
        "use_amp": True,
        "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
        "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
        "scheduler": {"type": "MultiStepLR", "milestones": [400000],
                      "gamma": 0.5},
        "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0,
                      "reduction": "mean"},
        "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                    "loss_weight": 0.1},
        "ema_decay": 0.999, "total_iter": 400000, "warmup_iter": -1,
        "net_d_iters": 1, "net_d_init_iters": 0,
    },
    "path": {"pretrain_network_g": None},
}
def measure(reps: int = 8):
    """Build the model, warm the per-combo degradation programs on one
    random sequence, then time the SAME reseeded sequence. Returns
    (ms_per_step, samples_per_s)."""
    import tempfile

    from super_resolution_tpu.runtime import build_model
    from super_resolution_tpu.utils.options import process_options

    o = process_options(dict(opt), tempfile.mkdtemp(), is_train=True)
    model = build_model(o)
    model.setup_training()

    rng = np.random.default_rng(0)
    gt_img = rng.random((batch, gt, gt, 3), dtype=np.float32)
    k = rng.random((batch, 21, 21), dtype=np.float32)
    k /= k.sum(axis=(1, 2), keepdims=True)
    data = {"gt": gt_img, "kernel1": k, "kernel2": k, "sinc_kernel": k}

    # The degradation chain jits one program per (resize-size, mode,
    # branch) combo (static shapes); a real 800k-iter run warms every
    # combo in its first minutes. To measure the steady-state step, warm
    # and time the SAME random sequence: reset the synth RNGs between
    # passes.
    def reseed():
        model.synth.rng = np.random.default_rng(99)
        model.synth.key = jax.random.PRNGKey(99)

    reseed()
    for it in range(1, 1 + reps):                  # compile pass
        model.optimize_parameters(data, it)
    _ = model.get_current_log()
    reseed()
    t0 = time.perf_counter()
    for it in range(1, 1 + reps):
        model.optimize_parameters(data, it)
    _ = {k2: float(v) for k2, v in model.get_current_log().items()}
    dt = (time.perf_counter() - t0) / reps
    return dt * 1e3, batch / dt


if __name__ == "__main__":
    ms, sps = measure()
    print(f"RealHATGAN step (deg+G+D+EMA, GT {gt} x{scale}, batch {batch}): "
          f"{ms:.1f} ms/step -> {sps:.2f} samples/s")
