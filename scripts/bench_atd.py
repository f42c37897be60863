"""ATD throughput: XLA window-MSA vs fused MSA megakernel on-chip.

A/B for the window-attention branch routing added in r3
(models/atd_arch.py:256-272 — the token-dictionary cross-attn and AC-MSA
branches are XLA either way; only the (S)W-MSA leg switches). Config is the
full ATD SRx4 (reference HAT/hat/archs/atd_arch.py paper config: embed 210,
6x6 depths, ws 16, 256 categories, 128 dictionary tokens); ATD-light
(embed 48, the reference __main__ smoke at atd_arch.py:1212-1218) via
ATD_LIGHT=1.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.atd_arch import ATD
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

if os.environ.get("ATD_LIGHT") == "1":
    kw = dict(embed_dim=48, depths=(6,) * 4, num_heads=(4,) * 4,
              window_size=16, category_size=128, num_tokens=64,
              reducted_dim=8, mlp_ratio=1.0, upscale=4,
              upsampler="pixelshuffledirect")
else:
    kw = dict(embed_dim=210, depths=(6,) * 6, num_heads=(6,) * 6,
              window_size=16, category_size=256, num_tokens=128,
              reducted_dim=20, mlp_ratio=2.0, upscale=4,
              upsampler="pixelshuffle")
fm = ATD(img_size=64, **kw)
h, w = 224, 256  # window-multiple eval tile (~Urban100 LR shape)
x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), jnp.float32)
variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3)))
pb = cast_floating(variables["params"], jnp.bfloat16)

for attn in ("xla", "pallas"):
    os.environ["SR_TPU_ATTN"] = attn
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
