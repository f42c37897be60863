"""End-to-end numerical check of the production TPU path.

Runs the same random-weight model + input through:
  (a) f32 with every Pallas route disabled (pure XLA — the configuration
      the golden CPU parity tests pin against the PyTorch reference), and
  (b) the production path: bf16 mixed precision with all Pallas kernels
      (attention megakernels, FFN/MLP blocks, LN-split) enabled,

and reports max|diff| and the PSNR of (b) vs (a) in [0, 1] image space —
the end-to-end counterpart of the per-kernel parity tests, run on the
real chip. The <= 0.01 dB budget tolerates output PSNR-vs-oracle ~60 dB+
(tests/test_precision.py pins the bf16 policy; this adds the kernels).

Usage: python scripts/tpu_parity_check.py [--arch fork|classic]
           [--hw 128] [--scale 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="fork", choices=["fork", "classic"])
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--scale", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

    kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6,
              num_heads=(6,) * 6, window_size=16, compress_ratio=3,
              squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5,
              mlp_ratio=2.0, upscale=args.scale, upsampler="pixelshuffle")
    if args.arch == "classic":
        from super_resolution_tpu.models.hat_classic_arch import HATClassic

        net = HATClassic(drop_path_rate=0.0, **kw)
    else:
        from super_resolution_tpu.models.hat_arch import HAT

        net = HAT(**kw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, args.hw, args.hw, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3),
                                                       jnp.float32))["params"]

    def run(pallas: bool, bf16: bool):
        mode = "auto" if pallas else "xla"
        for var in ["SR_TPU_ATTN", "SR_TPU_FFN", "SR_TPU_LNS"]:
            os.environ[var] = mode
        pp = cast_floating(params, jnp.bfloat16) if bf16 else params
        fn = wrap_apply(lambda p_, t: net.apply({"params": p_}, t),
                        jnp.bfloat16 if bf16 else None)
        out = jax.jit(fn)(pp, x)
        return np.asarray(out, np.float32)

    ref = run(pallas=False, bf16=False)          # f32 pure XLA
    prod = run(pallas=True, bf16=True)           # production path
    bf16_xla = run(pallas=False, bf16=True)      # isolate kernel effect

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return float("inf") if mse == 0 else -10 * np.log10(mse)

    print(json.dumps({
        "arch": args.arch, "hw": args.hw,
        "max_abs_prod_vs_f32xla": float(np.abs(prod - ref).max()),
        "psnr_prod_vs_f32xla_db": round(psnr(prod, ref), 2),
        "psnr_bf16xla_vs_f32xla_db": round(psnr(bf16_xla, ref), 2),
        "psnr_prod_vs_bf16xla_db": round(psnr(prod, bf16_xla), 2),
    }))


if __name__ == "__main__":
    main()
