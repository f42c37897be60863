"""HiT-SRF throughput: XLA path vs fused SCC block kernel on-chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.hitsrf_arch import HiT_SRF
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

# HiT-SRF SRx4 config (ref options: embed 60, 6x6 depths, base win 8,
# hier ratios 0.5..8)
kw = dict(img_size=64, embed_dim=60, depths=(6,) * 6, num_heads=(6,) * 6,
          base_win_size=(8, 8), mlp_ratio=2.0, upscale=4,
          upsampler="pixelshuffledirect")
fm = HiT_SRF(**kw)
h, w = 192, 192  # multiple of every hierarchical window (lcm 4..64 = 192)
b = int(os.environ.get("B", 4))
x = jnp.asarray(np.random.default_rng(0).random((b, h, w, 3)), jnp.float32)
variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
pb = cast_floating(variables["params"], jnp.bfloat16)

for attn in ("xla", "pallas"):
    os.environ["SR_TPU_ATTN"] = attn
    ab = wrap_apply(lambda p, t: fm.apply({"params": p}, t), jnp.bfloat16)

    @jax.jit
    def run(p, x):
        # carried dependency (t feeds the next iteration) so XLA cannot
        # hoist the loop-invariant body — see scripts/profile_classic.py
        def body(_, t):
            return t + (jnp.mean(ab(p, t)) * 0).astype(t.dtype)
        return jnp.mean(jax.lax.fori_loop(0, 5, body, x))

    float(run(pb, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(pb, x)); ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / 5
    print(f"{attn}: {dt*1e3:.1f} ms/batch -> {b*h*4*w*4/1e6/dt:.3f} out-Mpix/s")
