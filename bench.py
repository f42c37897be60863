"""Benchmark: HAT base x4 tiled inference throughput on one chip.

Protocol (mirrors the reference's direct-metrics harness,
HAT/ESC/scripts/test_direct_metrics.py: warmup then repeated timed runs on a
fixed synthetic input): a 1280x720 (HD) LR image upscaled x4 through the
full on-device tile engine (tile 256, halo 32 — options/test/
HAT_tile_example.yml numbers) with the flagship fork-HAT base config
(embed 180, 6x6 RHAG, window 16 — options/test/HAT_SRx4.yml:49-64).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the PyTorch-CPU reference running the same
fork-HAT on one 320x320 tile (see BASELINE_LOCAL in this file; target is
>=5x per BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

# PyTorch-CPU reference throughput for the same model/work, measured in this
# environment (single CPU core, torch 2.13.0+cpu, fork-HAT base x4 on a
# 320x320 tile, second no-grad forward after warmup: 311 s for 1.64 out-Mpix).
# Units: output Mpix/s.
BASELINE_LOCAL_OUT_MPIX_S = 0.0053


def main():
    import jax

    # Persistent compilation cache: XLA compiles over the axon tunnel are
    # minutes-long; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from super_resolution_tpu.models.hat_arch import HAT
    from super_resolution_tpu.runtime.tile import tile_forward

    scale = 4
    h, w = 720, 1280
    tile_size, tile_pad, chunk = 256, 32, 8

    net = HAT(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
              window_size=16, compress_ratio=3, squeeze_factor=30,
              conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
              upscale=scale, upsampler="pixelshuffle")
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]

    @jax.jit
    def run(params, img):
        # checksum forces full execution; fetching 4 bytes instead of the
        # 170MB output keeps tunnel transfer out of the timing
        out = tile_forward(lambda t: net.apply({"params": params}, t), img,
                           scale, tile_size, tile_pad, chunk=chunk)
        return jnp.mean(out)

    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)),
                    jnp.float32)

    # warmup / compile (block by fetching the scalar: block_until_ready is
    # not reliable on the axon backend)
    float(run(params, x))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, x))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    out_mpix = h * scale * w * scale / 1e6
    value = out_mpix / dt
    print(json.dumps({
        "metric": "HAT-base x4 tiled inference throughput (HD input, "
                  "tile 256/pad 32, 1 chip)",
        "value": round(value, 3),
        "unit": "out_Mpix/s",
        "vs_baseline": round(value / BASELINE_LOCAL_OUT_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
