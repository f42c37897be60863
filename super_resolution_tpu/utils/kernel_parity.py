"""End-to-end numerical parity of the production TPU path vs pure-XLA f32.

The CPU suite runs every Pallas kernel in interpreter mode, so 400 green
tests prove kernel *semantics*, not the compiled Mosaic lowering. This
check runs on the real backend: the same random-weight flagship model +
input through (a) f32 pure XLA (the configuration the golden CPU parity
tests pin against the PyTorch reference) and (b) the production bf16 +
all-Pallas path, and reports PSNRs. bench.py embeds the result in the
driver-visible JSON every round (round-2 verdict item 6).
"""

from __future__ import annotations

import os

import numpy as np


def kernel_parity(arch: str = "classic", hw: int = 128,
                  scale: int = 4) -> dict:
    """Returns {max_abs, psnr_prod_vs_f32xla_db, psnr_bf16xla_vs_f32xla_db,
    psnr_prod_vs_bf16xla_db} for the flagship config of `arch`."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

    kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6,
              num_heads=(6,) * 6, window_size=16, compress_ratio=3,
              squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5,
              mlp_ratio=2.0, upscale=scale, upsampler="pixelshuffle")
    if arch == "classic":
        from super_resolution_tpu.models.hat_classic_arch import HATClassic

        net = HATClassic(drop_path_rate=0.0, **kw)
    else:
        from super_resolution_tpu.models.hat_arch import HAT

        net = HAT(**kw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, hw, hw, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]

    saved = {v: os.environ.get(v)
             for v in ("SR_TPU_ATTN", "SR_TPU_FFN", "SR_TPU_LNS")}

    def run(pallas: bool, bf16: bool):
        mode = "auto" if pallas else "xla"
        for var in saved:
            os.environ[var] = mode
        pp = cast_floating(params, jnp.bfloat16) if bf16 else params
        fn = wrap_apply(lambda p_, t: net.apply({"params": p_}, t),
                        jnp.bfloat16 if bf16 else None)
        out = jax.jit(fn)(pp, x)
        return np.asarray(out, np.float32)

    try:
        ref = run(pallas=False, bf16=False)
        prod = run(pallas=True, bf16=True)
        bf16_xla = run(pallas=False, bf16=True)
    finally:
        for var, val in saved.items():
            if val is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = val

    def psnr(a, b):
        mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
        return float("inf") if mse == 0 else -10 * float(np.log10(mse))

    return {
        "max_abs_prod_vs_f32xla": float(np.abs(prod - ref).max()),
        "psnr_prod_vs_f32xla_db": round(psnr(prod, ref), 2),
        "psnr_bf16xla_vs_f32xla_db": round(psnr(bf16_xla, ref), 2),
        "psnr_prod_vs_bf16xla_db": round(psnr(prod, bf16_xla), 2),
    }
