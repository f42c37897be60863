"""Benchmark: HAT x4 tiled inference throughput on one chip.

Protocol (mirrors the reference's direct-metrics harness,
HAT/ESC/scripts/test_direct_metrics.py: warmup then repeated timed runs on
fixed synthetic inputs), three legs:

  1. HD leg: a 1280x720 LR upscaled x4 through the on-device tile engine
     (full-height bands — the plan measured fastest on v5e).
  2. Urban100-shape batched leg — THE north-star regime (BASELINE.md:
     HAT x4 Urban100 tiled): 16 LRs of 176x256 (the representative
     Urban100 LR shape) run through the production shape-bucketed
     cross-image batched pipeline (runtime/batched_eval.py) — whole-image
     tiles batched 8 per compiled step. Round 2 ran this regime one image
     at a time at batch 1 (4.4 vs 6.8 HD); batching across images is the
     round-3 fix.
  3. Urban100-shape per-image leg (kept for the gap narrative).

The headline arch is CLASSIC HAT — the official-checkpoint structure the
BASELINE protocol's weights describe (options/test/HAT_SRx4.yml:49-70,
strict_load_g: true); BENCH_ARCH=fork measures the fork's ESC-infused HAT.

Inference runs the bf16 mixed-precision policy (utils/precision.py; PSNR
cost pinned <= 0.01 dB by tests/test_precision.py). The JSON also embeds
the compiled-kernel parity check (utils/kernel_parity.py: production
bf16+Pallas vs f32 pure-XLA on this chip, both archs) and analytic
peak-activation estimates (axon hides backend memory stats).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured against the PyTorch-CPU reference running the same
fork-HAT on one 320x320 tile (BASELINE_LOCAL below; target >=5x per
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# PyTorch-CPU reference throughput for the same model/work, measured in this
# environment (single CPU core, torch 2.13.0+cpu, fork-HAT base x4 on a
# 320x320 tile, second no-grad forward after warmup: 311 s for 1.64 out-Mpix).
# Units: output Mpix/s.
BASELINE_LOCAL_OUT_MPIX_S = 0.0053

# PyTorch-CPU reference TRAIN-step throughput (scripts/baseline_torch_train.py
# — the reference's own fork-HAT through one L1+Adam+EMA step at the recipe
# shapes GT 256 / LQ 64 x4, batch 4: 296.2 s/step median of 2 after warmup,
# torch 2.13.0+cpu, r4). Units: samples/s.
BASELINE_TRAIN_SAMPLES_S = 0.0135

# PyTorch-CPU reference GAN-step throughput (scripts/baseline_torch_gan.py —
# the reference's own RealHATGANModel feed_data + optimize_parameters run on
# CPU, same shapes/losses as the bench GAN leg: 221.9 s/step median of 2
# after warmup, batch 4, torch 2.13.0+cpu, r4; CPU-contention variance on
# these anchors is ~+/-30%, so ratios are order-of-magnitude evidence).
# Units: samples/s.
BASELINE_GAN_SAMPLES_S = 0.0180


def _pair(s):
    return tuple(int(v) for v in s.split("x")) if "x" in s else int(s)


def _median_time(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _activation_estimate_mb(chunk, t_y, t_x, c_embed, scale, dtype_bytes=2,
                            stream_rows=0):
    """Analytic live-buffer estimate for one tile chunk (bf16): the widest
    point is the upsampler's conv->pixel-shuffle pair at the last stage;
    the body's deep features add ~3 concurrent C-channel maps (x, shortcut,
    block out). With the row-streamed tail (ops/streamed_tail.py,
    stream_rows > 0) the upsampler works on stream_rows + 2*halo rows at a
    time instead of the whole tile height."""
    body = 3 * chunk * t_y * t_x * c_embed * dtype_bytes
    num_feat = 64
    peak_up = 0
    ty = t_y if not stream_rows else min(t_y, stream_rows + 8)
    tx = t_x
    s = scale
    while s > 1:
        conv_out = chunk * ty * tx * 4 * num_feat * dtype_bytes
        ps_out = chunk * ty * 2 * tx * 2 * num_feat * dtype_bytes
        peak_up = max(peak_up, conv_out + ps_out)
        ty, tx, s = ty * 2, tx * 2, s // 2
    out_img = chunk * t_y * scale * t_x * scale * 3 * dtype_bytes
    return {
        "body_mb": round(body / 2 ** 20),
        "upsampler_peak_mb": round(peak_up / 2 ** 20),
        "output_mb": round(out_img / 2 ** 20),
        "stream_tail_rows": stream_rows,
    }


_T0 = time.time()


def _progress(msg):
    """Stage stamps on stderr (the driver parses the one stdout JSON line);
    compiles over the axon tunnel are minutes each — make them visible."""
    print(f"[bench {time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    import jax

    # Persistent compilation cache: XLA compiles over the axon tunnel are
    # minutes-long; cache them across runs.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from super_resolution_tpu.runtime.tile import tile_forward
    from super_resolution_tpu.utils.precision import (cast_floating,
                                                      resolve_dtype,
                                                      wrap_apply)

    scale = 4
    h, w = 720, 1280
    # Default plan measured fastest on v5e. Full-height bands kill the
    # vertical halo (tile_forward clamps 720+2*32 -> 720); 8 bands of
    # 720x(160+64) batch into one lax.map chunk — batch depth beats halo
    # fraction with the r3 fused-block kernels. Classic-arch sweep (r3):
    # 720x160/8 7.76 | 720x320/4 7.50 | 720x640/2 6.88 | 720x224/6 6.83 |
    # 720x192/7 6.45 | whole-image/1 5.52 | 352x320/8 3.92.
    # (r2, attention-only kernels: 720x320/4 6.05 was best; 720x640/2 OOM'd
    # before mlp_block got width-adaptive row tiles.)
    # r4 (streamed tail + _mlp_auto_rows): the upsampler peak no longer
    # caps the plan — 720x640/2 and whole-image 720x1280/1 now COMPILE
    # (the r3 OOM was the fused-MLP scoped-VMEM rule, fixed) — but bigger
    # tiles stay slower: 720x160/8 7.75 | 720x320/4 7.43 | 720x640/2 6.87
    # | 720x1280/1 (zero halo) 5.51. Halo waste (1.4x issue at pad 32) is
    # worth less than lax.map batch depth at these shapes; the halo-tax
    # ceiling is a batching property, not a memory one. The protocol-legal
    # lever stays pad 16 (window-size multiple): 1.2x issue, ~8.9.
    tile_size = _pair(os.environ.get("BENCH_TILE", "720x160"))
    tile_pad = _pair(os.environ.get("BENCH_PAD", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", 8))
    dtype = resolve_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    # r4: row-streamed reconstruction tail (ops/streamed_tail.py) removes
    # the upsampler's activation peak (was 5 GB at the r3 plan — the
    # binding constraint on tile growth). 0 disables.
    stream_rows = int(os.environ.get("BENCH_STREAM_TAIL", 64))

    # classic = the BASELINE protocol arch (official-ckpt HAT structure)
    arch = os.environ.get("BENCH_ARCH", "classic")
    kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6,
              num_heads=(6,) * 6, window_size=16, compress_ratio=3,
              squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5,
              mlp_ratio=2.0, upscale=scale, upsampler="pixelshuffle",
              stream_tail_rows=stream_rows)
    if arch == "classic":
        from super_resolution_tpu.models.hat_classic_arch import HATClassic

        net = HATClassic(drop_path_rate=0.0, **kw)
    else:
        from super_resolution_tpu.models.hat_arch import HAT

        net = HAT(**kw)
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]
    if dtype is not None:
        params = cast_floating(params, dtype)
    apply_fn = wrap_apply(
        lambda p, t: net.apply({"params": p}, t), dtype)

    # ------------------------------------------------------------- HD leg
    @jax.jit
    def run(params, img):
        # checksum forces full execution; fetching 4 bytes instead of the
        # 170MB output keeps tunnel transfer out of the timing
        out = tile_forward(lambda t: apply_fn(params, t), img,
                           scale, tile_size, tile_pad, chunk=chunk)
        return jnp.mean(out)

    _progress(f"HD leg compile+run ({arch}, tile {tile_size}/pad {tile_pad})")
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)),
                    jnp.float32)
    # warmup / compile (block by fetching the scalar: block_until_ready is
    # not reliable on the axon backend)
    float(run(params, x))
    dt = _median_time(lambda: float(run(params, x)))
    value = h * scale * w * scale / 1e6 / dt

    # HD leg at tile_pad 16: the reference only requires the pad to be a
    # window-size multiple (options/test/HAT_tile_example.yml:9) and 16 is
    # one; halo overhead drops 1.4x -> 1.2x (720x160 band + 2*pad). Kept as
    # a secondary field — the headline stays at the reference example's
    # pad 32. r3 measured: 8.82 vs 7.76 out-Mpix/s.
    pad16 = None
    _progress("HD pad16 leg")
    if os.environ.get("BENCH_HD_PAD16", "1") == "1":
        @jax.jit
        def run16(params, img):
            out = tile_forward(lambda t: apply_fn(params, t), img,
                               scale, tile_size, 16, chunk=chunk)
            return jnp.mean(out)

        float(run16(params, x))
        dt16 = _median_time(lambda: float(run16(params, x)))
        pad16 = round(h * scale * w * scale / 1e6 / dt16, 3)

    # ------------------------------------------- optional FHD / 4K legs
    # The reference's direct-metrics protocol measures HD, FHD and 4K
    # inputs (test_direct_metrics.py:43-105 / esc_arch.py:394-434). The
    # HD leg above is the headline; these mirror the other two protocol
    # sizes through the same tile engine. Off by default: each distinct
    # input height changes the band plan's compiled shape, and compiles
    # over the axon tunnel cost minutes of driver-bench time.
    extra_legs = {}
    for flag, name, (eh, ew) in (("BENCH_FHD", "fhd_value", (1080, 1920)),
                                 ("BENCH_4K", "uhd4k_value", (2160, 3840))):
        if os.environ.get(flag) != "1":
            continue
        # full-height bands at the same 160-col width; chunk scales with
        # the band count (eh/1080 rows -> 12 bands of 1920/160 etc.)
        eplan = (eh, 160)

        @jax.jit
        def run_e(params, img, _plan=eplan):
            out = tile_forward(lambda t: apply_fn(params, t), img,
                               scale, _plan, tile_pad, chunk=chunk)
            return jnp.mean(out)

        xe = jnp.asarray(np.random.default_rng(7).random((1, eh, ew, 3)),
                         jnp.float32)
        float(run_e(params, xe))
        dte = _median_time(lambda: float(run_e(params, xe)))
        extra_legs[name] = round(eh * scale * ew * scale / 1e6 / dte, 3)

    # ------------------------------- Urban100-shape BATCHED leg (north star)
    # 16 LRs at the representative Urban100 LR shape (GTs ~1024x680,
    # mod-cropped /4 -> 176x256 after window rounding) through the
    # production bucketed cross-image pipeline: whole-image tiles, 8 per
    # compiled step (runtime/batched_eval.py::_get_program — the exact
    # program val.bucketed_eval runs; host gather excluded, paste included).
    _progress("urban batched leg")
    from super_resolution_tpu.runtime.batched_eval import _get_program

    uh, uw = 176, 256
    g = int(os.environ.get("BENCH_URBAN_IMAGES", 16))
    uchunk = int(os.environ.get("BENCH_URBAN_CHUNK", 16))  # r3 sweep: 16 imgs/step 10.77 vs 8/step 10.63
    canvas_in = jnp.asarray(
        np.random.default_rng(1).random((g, uh, uw, 3)), jnp.float32)
    zeros = jnp.zeros((g,), jnp.int32)
    img_idx = jnp.arange(g, dtype=jnp.int32)
    brun = _get_program(apply_fn, scale, uh, uw, uh, uw, uchunk, None)

    def batched_step():
        canvas = brun(params, canvas_in, zeros, zeros, zeros, zeros,
                      zeros, zeros, img_idx)
        return float(jnp.mean(canvas))

    batched_step()  # compile (incl. the tiny eager mean reduction)
    bdt = _median_time(batched_step)
    bvalue = g * uh * scale * uw * scale / 1e6 / bdt

    # --------------------------------------- Urban100-shape per-image leg
    # whole-image single tile — the band plan would split 176x256 into two
    # 50%-overlapping tiles (a bench artifact, not a regime property)
    _progress("urban per-image leg")
    @jax.jit
    def run_whole(params, img):
        out = tile_forward(lambda t: apply_fn(params, t), img,
                           scale, (uh, uw), tile_pad, chunk=1)
        return jnp.mean(out)

    xu = jnp.asarray(np.random.default_rng(1).random((1, uh, uw, 3)),
                     jnp.float32)
    float(run_whole(params, xu))  # compile
    udt = _median_time(lambda: float(run_whole(params, xu)))
    uvalue = uh * scale * uw * scale / 1e6 / udt

    # ------------------------------------------------- compiled-kernel parity
    # production bf16+Pallas vs f32 pure-XLA on this backend, both archs
    # (the CPU suite only exercises interpret mode — verdict r2 item 6)
    _progress("kernel parity checks")
    from super_resolution_tpu.utils.kernel_parity import kernel_parity

    parity = {}
    if os.environ.get("BENCH_SKIP_PARITY") != "1":
        for parch in ("classic", "fork"):
            p = kernel_parity(parch, hw=128, scale=scale)
            parity[f"kernel_parity_{parch}_db"] = p["psnr_prod_vs_f32xla_db"]
            parity[f"kernel_parity_{parch}_vs_bf16xla_db"] = \
                p["psnr_prod_vs_bf16xla_db"]

    # ------------------------------------------------- machine roofline
    # Measured practical peaks of THIS chip (the axon-virtualized v5e
    # delivers ~1/5 of datasheet: scripts/roofline.py measured 37.7
    # bf16-matmul TFLOP/s and 141-175 GB/s HBM vs the 197/819 nameplate),
    # so MFU claims against datasheet numbers are meaningless here.
    # Carried-dependency fori loops — XLA cannot hoist the body.
    _progress("roofline")
    roofline = {}
    if os.environ.get("BENCH_SKIP_ROOFLINE") != "1":
        nmat, loops = 4096, 10
        amat = jnp.asarray(
            np.random.default_rng(2).random((nmat, nmat)), jnp.bfloat16)

        @jax.jit
        def mm(a):
            def body(_, t):
                return jax.lax.dot(
                    t, t, preferred_element_type=jnp.bfloat16) * 1e-3
            return jnp.sum(jax.lax.fori_loop(0, loops, body, a))

        float(mm(amat))
        dtm = _median_time(lambda: float(mm(amat))) / loops
        roofline["machine_matmul_tflops"] = round(2 * nmat ** 3 / dtm / 1e12,
                                                  1)
        nel = 128 * 1024 * 1024
        vel = jnp.zeros((nel,), jnp.bfloat16)

        @jax.jit
        def ew(v):
            def body(_, t):
                return t + jnp.bfloat16(1)
            return jnp.sum(jax.lax.fori_loop(0, loops, body, v))

        float(ew(vel))
        dte = _median_time(lambda: float(ew(vel))) / loops
        roofline["machine_membw_gbs"] = round(2 * nel * 2 / dte / 1e9)
        # useful model FLOPs at the HD headline vs the measured matmul peak
        # (BASELINE.md: ~3.125 MFLOP/out-pix, x1.2 band-halo issue factor)
        model_tflops = value * 3.125e6 * 1.2 / 1e6
        roofline["model_tflops"] = round(model_tflops, 1)
        roofline["pct_of_measured_matmul_peak"] = round(
            100 * model_tflops / roofline["machine_matmul_tflops"], 1)

    # ------------------------------------------------- training throughput
    # One jitted production train step (L1 + Adam + EMA, bf16 AMP) at the
    # reference recipe's shapes: GT 256 / LQ 64, batch 4 per device
    # (HAT/README.md:109 trains batch 4/GPU at ~20 GB). Full sweep incl.
    # remat memory boundaries: scripts/bench_train.py / README "Training
    # performance". Guarded: a train-side failure must not sink the
    # inference headline.
    _progress("train step leg")
    train_fields = {}
    if os.environ.get("BENCH_SKIP_TRAIN") != "1":
        try:
            from super_resolution_tpu.runtime.train_loop import (
                build_optimizer, init_train_state, make_sr_train_step)

            topt = {"pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                    "ema_decay": 0.999, "use_amp": True,
                    "optim_g": {"type": "Adam", "lr": 2e-4,
                                "betas": [0.9, 0.99]},
                    "scheduler": {"type": "MultiStepLR",
                                  "milestones": [300000], "gamma": 0.5},
                    "total_iter": 800000}
            tx, _ = build_optimizer(topt, {})
            # state donated like the runtime train paths (sr_model.py):
            # params/moments/EMA update in place, halving state residency
            tstep = jax.jit(make_sr_train_step(net, tx, topt),
                            donate_argnums=0)
            tb = 4
            trng = np.random.default_rng(3)
            tbatch = {
                "lq": jnp.asarray(trng.random((tb, 64, 64, 3)), jnp.float32),
                "gt": jnp.asarray(trng.random((tb, 256, 256, 3)),
                                  jnp.float32)}
            # f32 masters (the AMP contract: bf16 compute only) — the
            # inference copy above was cast to bf16
            tstate = init_train_state(
                cast_floating(params, jnp.float32), tx, topt["ema_decay"])
            tstate, tlogs = tstep(tstate, tbatch, rng)
            float(tlogs["l_pix"])

            def one_step():
                nonlocal tstate
                tstate, logs = tstep(tstate, tbatch, rng)
                float(logs["l_pix"])

            tdt = _median_time(one_step)
            train_fields = {
                "train_amp_ms_per_step": round(tdt * 1e3, 1),
                "train_amp_samples_s": round(tb / tdt, 2),
                "train_amp_batch": tb,
                "train_vs_baseline": round(
                    tb / tdt / BASELINE_TRAIN_SAMPLES_S, 1),
            }
        except Exception as e:  # noqa: BLE001
            train_fields = {"train_bench_error": repr(e)[:200]}

    # ------------------------------------------- GAN training throughput
    # The full Real-HAT-GAN step (on-device 2nd-order degradation synth,
    # device-resident pair pool, G step w/ L1+vanilla GAN vs SN-UNet D,
    # D step, EMA) at the reference recipe shapes (GT 256 x4, batch 4) —
    # realhatgan_model.py feed_data+optimize_parameters. Same warm/timed
    # reseeded-sequence protocol as scripts/bench_gan.py (the degradation
    # chain jits one program per resize combo; a real run warms them all
    # in minutes). Guarded like the train leg.
    _progress("GAN step leg")
    gan_fields = {}
    if arch == "classic" and os.environ.get("BENCH_SKIP_TRAIN") != "1":
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import bench_gan

            gms, gsps = bench_gan.measure(reps=4)
            gan_fields = {
                "gan_train_ms_per_step": round(gms, 1),
                "gan_train_samples_s": round(gsps, 2),
                "gan_train_batch": 4,
                "gan_vs_baseline": round(gsps / BASELINE_GAN_SAMPLES_S, 1),
            }
        except Exception as e:  # noqa: BLE001
            gan_fields = {"gan_bench_error": repr(e)[:200]}

    # peak device memory (reference protocol reports peak alloc —
    # test_direct_metrics.py:99-101); axon hides it -> analytic estimate
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak_mb = round(stats.get("peak_bytes_in_use", 0) / 2 ** 20) or None
    except Exception:
        peak_mb = None
    t_y = min((tile_size if isinstance(tile_size, int) else tile_size[0])
              + 2 * (tile_pad if isinstance(tile_pad, int) else tile_pad[0]), h)
    t_x = min((tile_size if isinstance(tile_size, int) else tile_size[1])
              + 2 * (tile_pad if isinstance(tile_pad, int) else tile_pad[1]), w)
    est = _activation_estimate_mb(chunk, t_y, t_x, 180, scale,
                                  2 if dtype is not None else 4,
                                  stream_rows=stream_rows)
    est["params_mb"] = round(sum(
        np.asarray(a).nbytes for a in jax.tree.leaves(params)) / 2 ** 20)

    _progress("done; emitting JSON")
    print(json.dumps({
        "metric": f"HAT-base-{arch} x4 tiled inference throughput "
                  f"(HD input, tile {tile_size}/pad {tile_pad}, "
                  f"{'bf16' if dtype is not None else 'f32'}, 1 chip)",
        "value": round(value, 3),
        "unit": "out_Mpix/s",
        "vs_baseline": round(value / BASELINE_LOCAL_OUT_MPIX_S, 2),
        "hd_pad16_value": pad16,
        **extra_legs,
        "urban100_batched_value": round(bvalue, 3),
        "urban100_batched_unit": f"out_Mpix/s ({g}x 176x256 LR, "
                                 f"bucketed batch {uchunk} — the north-star "
                                 "regime, production eval path)",
        "legacy_urban100_per_image_value": round(uvalue, 3),
        "legacy_urban100_per_image_unit": (
            "out_Mpix/s (176x256 LR one image per step — superseded by "
            "urban100_batched_value: the bucketed cross-image engine is the "
            "production val path since r3)"),
        "peak_device_mem_mb": peak_mb,
        "est_activation_mb": est,
        **train_fields,
        **gan_fields,
        **roofline,
        **parity,
    }))


if __name__ == "__main__":
    main()
