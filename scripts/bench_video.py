"""Video SR (BasicVSR x4) throughput on one chip.

Reference protocol shape: REDS4 clips, LR 320x180, x4 (BasicVSR is
trained/evaluated on REDS — basicsr/archs/basicvsr_arch.py). One jitted
forward over a T-frame clip (SpyNet flows + bidirectional recurrent
propagation + batched reconstruction), bf16. Metric: output Mpix/s and
frames/s. T via BENCH_FRAMES (default 7), BENCH_VSR_HW=180x320.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.basicvsr_arch import BasicVSR
from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

t = int(os.environ.get("BENCH_FRAMES", 7))
h, w = (int(v) for v in os.environ.get("BENCH_VSR_HW", "180x320").split("x"))
scale = 4
net = BasicVSR(num_feat=64, num_block=15)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.random((1, t, h, w, 3)), jnp.float32)
params = net.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, 2, 64, 64, 3)))["params"]
pb = cast_floating(params, jnp.bfloat16)
ab = wrap_apply(lambda p, v: net.apply({"params": p}, v), jnp.bfloat16)


@jax.jit
def run(p, v):
    return jnp.mean(ab(p, v))


float(run(pb, x))  # compile
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    float(run(pb, x))
dt = (time.perf_counter() - t0) / reps
print(f"BasicVSR x4, {t}x{h}x{w} clip: {dt*1e3:.1f} ms "
      f"-> {t/dt:.2f} frames/s, {t*h*scale*w*scale/1e6/dt:.3f} out-Mpix/s")
