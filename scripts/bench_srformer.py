"""SRFormer throughput: XLA path vs fused PSA block kernel on-chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.srformer_arch import SRFormer
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

# SRFormer SRx4 config (reference options: embed 180, 6x6 depths, ws 24)
kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
          window_size=24, mlp_ratio=2.0, upscale=4, upsampler="pixelshuffle")
fm = SRFormer(**kw)
h, w = 240, 240  # window-multiple eval tile
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
