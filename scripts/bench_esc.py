"""ESC throughput: XLA window-MSA vs fused MSA block kernel on-chip.

A/B for the vendored repo's flagship arch (reference
HAT/ESC/esc/archs/esc_arch.py — its headline claim is window-attention
latency, ESC README:5). Config = ESC DIV2K x4
(options/esc/test/ESC_DIV2K_X4.yml: dim 64, pdim 16, 13x13 PLK, 5 blocks
x 5 conv_blocks, ws 32, 4 heads); ESC_XL=1 benches the XL config
(dim 192, ws 48, 8 blocks).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.esc_arch import ESC
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

if os.environ.get("ESC_XL") == "1":
    kw = dict(dim=192, pdim=48, kernel_size=13, n_blocks=8, conv_blocks=5,
              window_size=48, num_heads=12, upscaling_factor=4,
              exp_ratio=1.25, use_ln=True)
    h, w = 240, 288  # ws-48 multiple, ~Urban100 LR area
else:
    kw = dict(dim=64, pdim=16, kernel_size=13, n_blocks=5, conv_blocks=5,
              window_size=32, num_heads=4, upscaling_factor=4,
              exp_ratio=1.25)
    h, w = 224, 256  # ws-32 multiple (~Urban100 LR shape)
fm = ESC(**kw)
x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), jnp.float32)
ws = kw["window_size"]
variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, ws, ws, 3)))
pb = cast_floating(variables["params"], jnp.bfloat16)

legs = ["xla", "pallas"]
if os.environ.get("ESC_XL") == "1":
    legs += ["qtile", "flash"]   # large-window experimental routes (A/B)
for attn in legs:
    os.environ["SR_TPU_ATTN"] = "pallas" if attn in ("qtile", "flash") \
        else attn
    os.environ["SR_TPU_QTILE"] = "1" if attn == "qtile" else "0"
    os.environ["SR_TPU_FLASH"] = "1" if attn == "flash" else "0"
    ab = wrap_apply(lambda p, t: fm.apply({"params": p}, t), jnp.bfloat16)

    @jax.jit
    def run(p, x):
        # carried dependency so XLA cannot hoist the loop-invariant body
        def body(_, t):
            return t + (jnp.mean(ab(p, t)) * 0).astype(t.dtype)
        return jnp.mean(jax.lax.fori_loop(0, 5, body, x))

    float(run(pb, x))
    t0 = time.perf_counter(); float(run(pb, x)); dt = (time.perf_counter() - t0) / 5
    print(f"{attn}: {dt*1e3:.1f} ms/img -> {h*4*w*4/1e6/dt:.3f} out-Mpix/s")
