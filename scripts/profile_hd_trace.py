"""Profile the bench HD leg with a real device trace and print the top ops.

jax.profiler traces DO work over the axon tunnel (probed r5 — unlike
memory_stats/device_memory_profile) and emit both an xplane.pb and a
Chrome trace.json.gz; the latter parses with stdlib json. This is the
TraceWindow-style evidence VERDICT r4 item 2 asks the perf work to be
driven by: aggregate per-op device time over a couple of timed reps of
the exact bench HD program, rank, and attack the top entry.

Usage: python scripts/profile_hd_trace.py [--reps 2] [--top 30]
           [--tile 720x160] [--pad 32] [--chunk 8] [--out /tmp/hd_trace]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pair(s):
    return tuple(int(v) for v in s.split("x")) if "x" in s else int(s)


def build_hd_run(tile_size, tile_pad, chunk):
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.models.hat_classic_arch import HATClassic
    from super_resolution_tpu.runtime.tile import tile_forward
    from super_resolution_tpu.utils.precision import (cast_floating,
                                                      resolve_dtype,
                                                      wrap_apply)

    scale, h, w = 4, 720, 1280
    dtype = resolve_dtype("bfloat16")
    net = HATClassic(img_size=64, embed_dim=180, depths=(6,) * 6,
                     num_heads=(6,) * 6, window_size=16, compress_ratio=3,
                     squeeze_factor=30, conv_scale=0.01, overlap_ratio=0.5,
                     mlp_ratio=2.0, upscale=scale, upsampler="pixelshuffle",
                     stream_tail_rows=64, drop_path_rate=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = cast_floating(params["params"], dtype)
    apply_fn = wrap_apply(lambda p, t: net.apply({"params": p}, t), dtype)

    @jax.jit
    def run(params, img):
        out = tile_forward(lambda t: apply_fn(params, t), img,
                           scale, tile_size, tile_pad, chunk=chunk)
        return jnp.mean(out)

    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)),
                    jnp.float32)
    return run, params, x


def aggregate_trace(logdir, top=30):
    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    assert runs, f"no profile run under {logdir}"
    path = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))[0]
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    per_op = defaultdict(float)
    counts = defaultdict(int)
    total_device = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pid_names.get(e.get("pid"), "")
        # device op tracks (XLA ops / TensorCore); skip host python threads
        if not any(k in pname for k in ("XLA", "TPU", "/device",
                                        "TensorCore", "Device")):
            continue
        per_op[e["name"]] += e["dur"]
        counts[e["name"]] += 1
        total_device += e["dur"]
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])[:top]
    return rows, counts, total_device, pid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--tile", default="720x160")
    ap.add_argument("--pad", default="32")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--out", default="/tmp/hd_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip running; parse the newest trace in --out")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        run, params, x = build_hd_run(_pair(args.tile), _pair(args.pad),
                                      args.chunk)
        print("compiling/warming...", file=sys.stderr, flush=True)
        float(run(params, x))
        jax.profiler.start_trace(args.out)
        for _ in range(args.reps):
            float(run(params, x))
        jax.profiler.stop_trace()

    rows, counts, total, pids = aggregate_trace(args.out, args.top)
    print(f"device tracks: {sorted(set(pids.values()))}", file=sys.stderr)
    print(f"total device-op time: {total / 1e3:.1f} ms over the window")
    for name, dur in rows:
        print(f"{dur / 1e3:9.2f} ms  {100 * dur / max(total, 1):5.1f}%  "
              f"x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
