"""Benchmark: HAT x4 tiled inference throughput on one chip.

Protocol (mirrors the reference's direct-metrics harness,
HAT/ESC/scripts/test_direct_metrics.py: warmup then repeated timed runs on
fixed synthetic inputs). Legs, in scoreboard-priority order:

  1. HD leg (headline): a 1280x720 LR upscaled x4 through the on-device
     tile engine (full-height bands — the plan measured fastest on v5e).
  2. Urban100-shape batched leg — THE north-star regime (BASELINE.md:
     HAT x4 Urban100 tiled): 16 LRs of 176x256 through the production
     shape-bucketed cross-image batched pipeline (runtime/batched_eval.py).
  3. Training-step leg (L1+Adam+EMA, bf16 AMP, recipe shapes).
  4. Real-HAT-GAN step leg (degradation synth + G + D + EMA).
  5. Compiled-kernel parity (production bf16+Pallas vs f32 pure-XLA).
  6. Optional extras: HD pad16, legacy per-image urban, machine roofline,
     FHD/4K protocol sizes.

TIMEOUT-PROOFING (round 5 — BENCH_r04 was rc:124/parsed:null because the
JSON was all-or-nothing at the end): a complete JSON line with every field
gathered so far is printed to stdout after EVERY leg; readers take the
LAST parseable line. A wall-clock budget (SR_BENCH_BUDGET_S, default 900)
is checked between legs — once exceeded, remaining optional legs are
skipped; a hard cap (SR_BENCH_HARD_S, default 1100) stops even essential
legs so the final emit always lands before the driver's kill. Every leg is
exception-guarded: one failing leg records <leg>_error and the rest run.

The headline arch is CLASSIC HAT — the official-checkpoint structure the
BASELINE protocol's weights describe (options/test/HAT_SRx4.yml:49-70,
strict_load_g: true); BENCH_ARCH=fork measures the fork's ESC-infused HAT.

Inference runs the bf16 mixed-precision policy (utils/precision.py; PSNR
cost pinned <= 0.01 dB by tests/test_precision.py).

Prints JSON lines: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured against the PyTorch-CPU reference running the same
fork-HAT on one 320x320 tile (BASELINE_LOCAL below; target >=5x per
BASELINE.md).

Device memory: the axon plugin returns None from memory_stats() and
jax.profiler.device_memory_profile() hard-aborts the process (probed r5) —
so peak device memory is NOT measurable here; est_activation_mb carries the
analytic model instead (reference protocol: test_direct_metrics.py:99-101).
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

# Scoreboard history of the two throughput headlines (out-Mpix/s) so a
# timed-out or regressed round cannot silently void the record (VERDICT r4
# weak-2). r4 is absent: BENCH_r04 timed out before emitting (rc 124).
HEADLINE_HISTORY = {
    "r2": {"value": 6.77, "urban100_batched_value": None},
    "r3": {"value": 7.848, "urban100_batched_value": 10.866},
    "r4": "driver bench timed out (rc 124) — no numbers captured",
    # builder-measured after the r5 roll-free shifted-window fold
    # (commit 748b332): the in-round record if the driver leg regresses.
    "r5_builder": {"value": 8.52, "urban100_batched_value": 11.80},
}

_T0 = time.time()


def _elapsed():
    return time.time() - _T0


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


def _progress(msg):
    """Stage stamps on stderr (the driver parses stdout JSON lines);
    compiles over the axon tunnel are minutes each — make them visible."""
    print(f"[bench {_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


class Emitter:
    """Accumulates bench fields and prints the FULL JSON line after every
    leg. A reader taking either the last line or the last parseable line
    of stdout gets the most complete record available at kill time."""

    def __init__(self):
        self.fields = {}

    def update(self, **kw):
        self.fields.update(kw)

    def emit(self):
        print(json.dumps(self.fields), flush=True)


def main():
    budget_s = float(os.environ.get("SR_BENCH_BUDGET_S", 900))
    hard_s = float(os.environ.get("SR_BENCH_HARD_S", 1100))
    em = Emitter()

    def over(limit, leg):
        if _elapsed() > limit:
            _progress(f"budget exceeded ({_elapsed():.0f}s > {limit:.0f}s) "
                      f"— skipping {leg}")
            skipped = em.fields.get("skipped_legs", [])
            em.update(skipped_legs=skipped + [leg])
            return True
        return False

    import jax

    # Persistent compilation cache: XLA compiles over the axon tunnel are
    # minutes-long; cache them across runs. NOTE: any Pallas-kernel edit
    # invalidates entries — first post-edit run pays cold compiles (r4's HD
    # compile was 198 s cold vs 99 s warm); the budget machinery absorbs it.
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
    # r4 (streamed tail + _mlp_auto_rows): bigger tiles COMPILE but stay
    # slower — 720x160/8 7.75 | 720x320/4 7.43 | 720x640/2 6.87 |
    # 720x1280/1 (zero halo) 5.51. Halo waste is worth less than lax.map
    # batch depth at these shapes. The protocol-legal lever stays pad 16
    # (window-size multiple): 1.2x issue, ~8.9.
    tile_size = _pair(os.environ.get("BENCH_TILE", "720x160"))
    tile_pad = _pair(os.environ.get("BENCH_PAD", "32"))
    chunk = int(os.environ.get("BENCH_CHUNK", 8))
    dtype = resolve_dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    # r4: row-streamed reconstruction tail (ops/streamed_tail.py) removes
    # the upsampler's activation peak. 0 disables.
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

    t_y = min((tile_size if isinstance(tile_size, int) else tile_size[0])
              + 2 * (tile_pad if isinstance(tile_pad, int) else tile_pad[0]),
              h)
    t_x = min((tile_size if isinstance(tile_size, int) else tile_size[1])
              + 2 * (tile_pad if isinstance(tile_pad, int) else tile_pad[1]),
              w)
    est = _activation_estimate_mb(chunk, t_y, t_x, 180, scale,
                                  2 if dtype is not None else 4,
                                  stream_rows=stream_rows)
    est["params_mb"] = round(sum(
        np.asarray(a).nbytes for a in jax.tree.leaves(params)) / 2 ** 20)
    em.update(
        metric=f"HAT-base-{arch} x4 tiled inference throughput "
               f"(HD input, tile {tile_size}/pad {tile_pad}, "
               f"{'bf16' if dtype is not None else 'f32'}, 1 chip)",
        value=None, unit="out_Mpix/s", vs_baseline=None,
        # axon hides memory_stats() and device_memory_profile() aborts the
        # process (probed r5); analytic model below is the best available.
        est_activation_mb=est,
        headline_history=HEADLINE_HISTORY,
        bench_budget_s=budget_s,
    )

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
    try:
        # warmup / compile (block by fetching the scalar: block_until_ready
        # is not reliable on the axon backend)
        float(run(params, x))
        dt = _median_time(lambda: float(run(params, x)))
        value = h * scale * w * scale / 1e6 / dt
        em.update(value=round(value, 3),
                  vs_baseline=round(value / BASELINE_LOCAL_OUT_MPIX_S, 2))
    except Exception as e:  # noqa: BLE001
        value = None
        em.update(hd_leg_error=repr(e)[:200])
    em.emit()

    # ------------------------------- Urban100-shape BATCHED leg (north star)
    # 16 LRs at the representative Urban100 LR shape (GTs ~1024x680,
    # mod-cropped /4 -> 176x256 after window rounding) through the
    # production bucketed cross-image pipeline: whole-image tiles, 8 per
    # compiled step (runtime/batched_eval.py::_get_program — the exact
    # program val.bucketed_eval runs; host gather excluded, paste included).
    uh, uw = 176, 256
    if not over(hard_s, "urban_batched"):
        _progress("urban batched leg")
        try:
            from super_resolution_tpu.runtime.batched_eval import _get_program

            g = int(os.environ.get("BENCH_URBAN_IMAGES", 16))
            # r3 sweep: 16 imgs/step 10.77 vs 8/step 10.63
            uchunk = int(os.environ.get("BENCH_URBAN_CHUNK", 16))
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
            em.update(
                urban100_batched_value=round(bvalue, 3),
                urban100_batched_unit=f"out_Mpix/s ({g}x 176x256 LR, "
                                      f"bucketed batch {uchunk} — the "
                                      "north-star regime, production eval "
                                      "path)")
        except Exception as e:  # noqa: BLE001
            em.update(urban_batched_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------------- training throughput
    # One jitted production train step (L1 + Adam + EMA, bf16 AMP) at the
    # reference recipe's shapes: GT 256 / LQ 64, batch 4 per device
    # (HAT/README.md:109 trains batch 4/GPU at ~20 GB). Full sweep incl.
    # remat memory boundaries: scripts/bench_train.py / README "Training
    # performance".
    if (os.environ.get("BENCH_SKIP_TRAIN") != "1"
            and not over(hard_s, "train_step")):
        _progress("train step leg")
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
            em.update(
                train_amp_ms_per_step=round(tdt * 1e3, 1),
                train_amp_samples_s=round(tb / tdt, 2),
                train_amp_batch=tb,
                train_vs_baseline=round(
                    tb / tdt / BASELINE_TRAIN_SAMPLES_S, 1))
            del tstate, tstep
        except Exception as e:  # noqa: BLE001
            em.update(train_bench_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------- GAN training throughput
    # The full Real-HAT-GAN step (on-device 2nd-order degradation synth,
    # device-resident pair pool, G step w/ L1+vanilla GAN vs SN-UNet D,
    # D step, EMA) at the reference recipe shapes (GT 256 x4, batch 4) —
    # realhatgan_model.py feed_data+optimize_parameters. Same warm/timed
    # reseeded-sequence protocol as scripts/bench_gan.py (the degradation
    # chain jits one program per resize combo; a real run warms them all
    # in minutes).
    if (arch == "classic" and os.environ.get("BENCH_SKIP_TRAIN") != "1"
            and not over(hard_s, "gan_step")):
        _progress("GAN step leg")
        try:
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "scripts"))
            import bench_gan

            gms, gsps = bench_gan.measure(
                reps=int(os.environ.get("BENCH_GAN_REPS", 4)))
            em.update(
                gan_train_ms_per_step=round(gms, 1),
                gan_train_samples_s=round(gsps, 2),
                gan_train_batch=4,
                gan_vs_baseline=round(gsps / BASELINE_GAN_SAMPLES_S, 1))
        except Exception as e:  # noqa: BLE001
            em.update(gan_bench_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------------- compiled-kernel parity
    # production bf16+Pallas vs f32 pure-XLA on this backend, both archs
    # (the CPU suite only exercises interpret mode — verdict r2 item 6)
    if (os.environ.get("BENCH_SKIP_PARITY") != "1"
            and not over(budget_s, "kernel_parity")):
        _progress("kernel parity checks")
        try:
            from super_resolution_tpu.utils.kernel_parity import kernel_parity

            for parch in ("classic", "fork"):
                p = kernel_parity(parch, hw=128, scale=scale)
                em.update(**{
                    f"kernel_parity_{parch}_db": p["psnr_prod_vs_f32xla_db"],
                    f"kernel_parity_{parch}_vs_bf16xla_db":
                        p["psnr_prod_vs_bf16xla_db"]})
                if over(hard_s, "kernel_parity_fork"):
                    break
        except Exception as e:  # noqa: BLE001
            em.update(kernel_parity_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------------- HD pad16 (optional)
    # The reference only requires the pad to be a window-size multiple
    # (options/test/HAT_tile_example.yml:9) and 16 is one; halo overhead
    # drops 1.4x -> 1.2x. Secondary field — the headline stays at the
    # reference example's pad 32. r3 measured: 8.82 vs 7.76 out-Mpix/s.
    if (os.environ.get("BENCH_HD_PAD16", "1") == "1"
            and not over(budget_s, "hd_pad16")):
        _progress("HD pad16 leg")
        try:
            @jax.jit
            def run16(params, img):
                out = tile_forward(lambda t: apply_fn(params, t), img,
                                   scale, tile_size, 16, chunk=chunk)
                return jnp.mean(out)

            float(run16(params, x))
            dt16 = _median_time(lambda: float(run16(params, x)))
            em.update(hd_pad16_value=round(
                h * scale * w * scale / 1e6 / dt16, 3))
        except Exception as e:  # noqa: BLE001
            em.update(hd_pad16_error=repr(e)[:200])
        em.emit()

    # --------------------------------------- Urban100-shape per-image leg
    # whole-image single tile — kept for the gap narrative only.
    if not over(budget_s, "urban_per_image"):
        _progress("urban per-image leg")
        try:
            @jax.jit
            def run_whole(params, img):
                out = tile_forward(lambda t: apply_fn(params, t), img,
                                   scale, (uh, uw), tile_pad, chunk=1)
                return jnp.mean(out)

            xu = jnp.asarray(
                np.random.default_rng(1).random((1, uh, uw, 3)), jnp.float32)
            float(run_whole(params, xu))  # compile
            udt = _median_time(lambda: float(run_whole(params, xu)))
            em.update(
                legacy_urban100_per_image_value=round(
                    uh * scale * uw * scale / 1e6 / udt, 3),
                legacy_urban100_per_image_unit=(
                    "out_Mpix/s (176x256 LR one image per step — superseded "
                    "by urban100_batched_value: the bucketed cross-image "
                    "engine is the production val path since r3)"))
        except Exception as e:  # noqa: BLE001
            em.update(urban_per_image_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------------- machine roofline
    # Measured practical peaks of THIS chip (the axon-virtualized v5e
    # delivers ~1/5 of datasheet: scripts/roofline.py measured 37.7
    # bf16-matmul TFLOP/s and 141-175 GB/s HBM vs the 197/819 nameplate),
    # so MFU claims against datasheet numbers are meaningless here.
    # Carried-dependency fori loops — XLA cannot hoist the body.
    if (os.environ.get("BENCH_SKIP_ROOFLINE") != "1"
            and not over(budget_s, "roofline")):
        _progress("roofline")
        try:
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
            matmul_tflops = round(2 * nmat ** 3 / dtm / 1e12, 1)
            em.update(machine_matmul_tflops=matmul_tflops)
            nel = 128 * 1024 * 1024
            vel = jnp.zeros((nel,), jnp.bfloat16)

            @jax.jit
            def ew(v):
                def body(_, t):
                    return t + jnp.bfloat16(1)
                return jnp.sum(jax.lax.fori_loop(0, loops, body, v))

            float(ew(vel))
            dte = _median_time(lambda: float(ew(vel))) / loops
            em.update(machine_membw_gbs=round(2 * nel * 2 / dte / 1e9))
            if value:
                # useful model FLOPs at the HD headline vs the measured
                # matmul peak (BASELINE.md: ~3.125 MFLOP/out-pix, x1.2
                # band-halo issue factor)
                model_tflops = value * 3.125e6 * 1.2 / 1e6
                em.update(
                    model_tflops=round(model_tflops, 1),
                    pct_of_measured_matmul_peak=round(
                        100 * model_tflops / matmul_tflops, 1))
        except Exception as e:  # noqa: BLE001
            em.update(roofline_error=repr(e)[:200])
        em.emit()

    # ------------------------------------------- optional FHD / 4K legs
    # The reference's direct-metrics protocol measures HD, FHD and 4K
    # inputs (test_direct_metrics.py:43-105 / esc_arch.py:394-434). Off by
    # default: each distinct input height changes the band plan's compiled
    # shape, and compiles over the axon tunnel cost minutes.
    for flag, name, (eh, ew_) in (("BENCH_FHD", "fhd_value", (1080, 1920)),
                                  ("BENCH_4K", "uhd4k_value", (2160, 3840))):
        if os.environ.get(flag) != "1" or over(budget_s, name):
            continue
        _progress(f"{name} leg")
        try:
            eplan = (eh, 160)

            @jax.jit
            def run_e(params, img, _plan=eplan):
                out = tile_forward(lambda t: apply_fn(params, t), img,
                                   scale, _plan, tile_pad, chunk=chunk)
                return jnp.mean(out)

            xe = jnp.asarray(
                np.random.default_rng(7).random((1, eh, ew_, 3)),
                jnp.float32)
            float(run_e(params, xe))
            dte2 = _median_time(lambda: float(run_e(params, xe)))
            em.update(**{name: round(eh * scale * ew_ * scale / 1e6 / dte2,
                                     3)})
        except Exception as e:  # noqa: BLE001
            em.update(**{name + "_error": repr(e)[:200]})
        em.emit()

    _progress("done; emitting final JSON")
    em.update(bench_wall_s=round(_elapsed(), 1))
    em.emit()


if __name__ == "__main__":
    main()
