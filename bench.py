"""Benchmark: HAT base x4 tiled inference throughput on one chip.

Protocol (mirrors the reference's direct-metrics harness,
HAT/ESC/scripts/test_direct_metrics.py: warmup then repeated timed runs on a
fixed synthetic input): a 1280x720 (HD) LR image upscaled x4 through the
full on-device tile engine with the flagship fork-HAT base config
(embed 180, 6x6 RHAG, window 16 — options/test/HAT_SRx4.yml:49-64).

Inference runs the bf16 mixed-precision policy (utils/precision.py; f32
softmax/LN stats) whose PSNR cost is pinned <= 0.01 dB by
tests/test_precision.py. Override with BENCH_DTYPE=float32 for the f32
number. BENCH_TILE / BENCH_PAD / BENCH_CHUNK override the tile plan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the PyTorch-CPU reference running the same
fork-HAT on one 320x320 tile (see BASELINE_LOCAL in this file; target is
>=5x per BASELINE.md).
"""

from __future__ import annotations

import json
import os
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
    from super_resolution_tpu.utils.precision import (cast_floating,
                                                      resolve_dtype,
                                                      wrap_apply)

    scale = 4
    h, w = 720, 1280
    def _pair(s):
        return tuple(int(v) for v in s.split("x")) if "x" in s else int(s)

    # Default plan measured fastest on v5e (r2): full-height bands kill the
    # vertical halo entirely (tile_forward clamps 720+2*32 -> 720); 4 bands
    # of 720x(320+64) batch exactly into one lax.map chunk. Sweep:
    # 256-sq/8 4.95 | 720x192/7 5.36 | 720x256/5 5.55 | 720x320/4 6.05 |
    # 720x640/2 OOM | whole-image/1 2.23.
    tile_size = _pair(os.environ.get("BENCH_TILE", "720x320"))
    tile_pad = _pair(os.environ.get("BENCH_PAD", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", 4))
    dtype = resolve_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))

    arch = os.environ.get("BENCH_ARCH", "fork")
    if arch == "classic":
        # official-checkpoint HAT structure (W-MSA HAB; the BASELINE north
        # star's Urban100 protocol runs these weights)
        from super_resolution_tpu.models.hat_classic_arch import HATClassic

        net = HATClassic(img_size=64, embed_dim=180, depths=(6,) * 6,
                         num_heads=(6,) * 6, window_size=16,
                         compress_ratio=3, squeeze_factor=30,
                         conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
                         drop_path_rate=0.0, upscale=scale,
                         upsampler="pixelshuffle")
    else:
        net = HAT(img_size=64, embed_dim=180, depths=(6,) * 6,
                  num_heads=(6,) * 6, window_size=16, compress_ratio=3,
                  squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5,
                  mlp_ratio=2.0, upscale=scale, upsampler="pixelshuffle")
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    if dtype is not None:
        params = cast_floating(params, dtype)
    apply_fn = wrap_apply(
        lambda p, t: net.apply({"params": p}, t), dtype)

    @jax.jit
    def run(params, img):
        # checksum forces full execution; fetching 4 bytes instead of the
        # 170MB output keeps tunnel transfer out of the timing
        out = tile_forward(lambda t: apply_fn(params, t), img,
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

    # Urban100-shaped leg: the BASELINE metric is defined on Urban100 x4
    # tiled inference (BASELINE.md north star). The dataset isn't mounted;
    # a representative LR shape (176x256 — Urban100 GTs are ~1024x680,
    # mod-cropped /4) runs the same tiled path. Urban100 LRs are smaller
    # than one 256-tile, so this is the per-image (whole-image-sized tile)
    # regime rather than the HD multi-tile regime.
    uh, uw = 176, 256
    xu = jnp.asarray(np.random.default_rng(1).random((1, uh, uw, 3)),
                     jnp.float32)
    float(run(params, xu))  # compile
    utimes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, xu))
        utimes.append(time.perf_counter() - t0)
    uvalue = uh * scale * uw * scale / 1e6 / float(np.median(utimes))

    # peak device memory (the reference's protocol also reports peak
    # alloc — test_direct_metrics.py:99-101); absent on some backends
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_mb = round(stats.get("peak_bytes_in_use", 0) / 2 ** 20) or None
    except Exception:
        peak_mb = None  # not exposed by this backend (e.g. axon tunnel)

    print(json.dumps({
        "metric": f"HAT-base{'-classic' if arch == 'classic' else ''} x4 "
                  "tiled inference throughput (HD input, "
                  f"tile {tile_size}/pad {tile_pad}, "
                  f"{'bf16' if dtype is not None else 'f32'}, 1 chip)",
        "peak_device_mem_mb": peak_mb,
        "value": round(value, 3),
        "unit": "out_Mpix/s",
        "vs_baseline": round(value / BASELINE_LOCAL_OUT_MPIX_S, 2),
        "urban100_shape_value": round(uvalue, 3),
        "urban100_shape_unit": "out_Mpix/s (176x256 LR, per-image regime)",
    }))


if __name__ == "__main__":
    main()
