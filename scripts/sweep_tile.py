"""Tile-plan sweep for the HD leg with the row-streamed tail (r4).

The r3 sweep (bench.py comments) was bound by the upsampler activation
peak; with ops/streamed_tail.py the tail works in row bands, so larger
tiles (less halo waste) become feasible. Prints one line per plan:
plan chunk stream -> out_Mpix/s.

Usage: python scripts/sweep_tile.py "720x160:8 720x320:4 720x640:2 720x1280:1"
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from super_resolution_tpu.models.hat_classic_arch import HATClassic
from super_resolution_tpu.runtime.tile import tile_forward
from super_resolution_tpu.utils.precision import (cast_floating, resolve_dtype,
                                                  wrap_apply)

scale = 4
h, w = 720, 1280
pad = int(os.environ.get("SWEEP_PAD", 32))
stream = int(os.environ.get("SWEEP_STREAM", 64))
plans = sys.argv[1].split() if len(sys.argv) > 1 else \
    ["720x160:8", "720x320:4", "720x640:2", "720x1280:1"]

kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
          window_size=16, compress_ratio=3, squeeze_factor=30,
          conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0, upscale=scale,
          upsampler="pixelshuffle", stream_tail_rows=stream)
net = HATClassic(drop_path_rate=0.0, **kw)
dtype = resolve_dtype("bfloat16")
params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
params = cast_floating(params, dtype)
apply_fn = wrap_apply(lambda p, t: net.apply({"params": p}, t), dtype)
x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), jnp.float32)

for plan in plans:
    spec, chunk = plan.split(":")
    ty, tx = (int(v) for v in spec.split("x"))
    chunk = int(chunk)

    @jax.jit
    def run(params, img, _ts=(ty, tx), _c=chunk):
        out = tile_forward(lambda t: apply_fn(params, t), img, scale,
                           _ts, pad, chunk=_c)
        return jnp.mean(out)

    try:
        t0 = time.time()
        float(run(params, x))
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(params, x))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        mpix = h * scale * w * scale / 1e6 / dt
        print(f"{spec}:{chunk} pad{pad} stream{stream} -> {mpix:.3f} "
              f"out_Mpix/s ({dt*1e3:.0f} ms, compile {compile_s:.0f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{spec}:{chunk} pad{pad} stream{stream} -> FAIL "
              f"{repr(e)[:160]}", flush=True)
