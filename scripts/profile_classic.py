"""Per-component timing for the CLASSIC-HAT hot path (the bench headline
arch) on the current backend.

Times each sub-module on the production band-tile shape with the bench
protocol (fori-amortized inside one jit; a bare dispatch over the axon
tunnel costs ~30 ms). Components:

  hab        one unshifted HABClassic block (x36 in the full model)
  hab_s      one shifted block (roll + mask variant)
  msa        the fused MSA block kernel alone (qkv+attn+proj)
  cab        the CAB conv branch alone (inc. channel attention)
  norm1      one LayerNorm
  mlp        the fused MLP tail kernel alone
  ocab       one OCABClassic block (x6)
  rhag_conv  the per-RHAG 3x3 conv

Usage: python scripts/profile_classic.py [--batch 4] [--h 720 --w 384]
           [--dtype bf16] [--reps 5] [--only msa,cab,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--h", type=int, default=720)
    p.add_argument("--w", type=int, default=384)
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--ws", type=int, default=16)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--loops", type=int, default=10)
    p.add_argument("--only", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flax import linen as nn

    from super_resolution_tpu.models.hat_classic_arch import (CABClassic,
                                                              HABClassic,
                                                              OCABClassic)
    from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    b, h, w, c = args.batch, args.h, args.w, args.dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, h, w, c)), jnp.float32)

    def timed(name, mod, inp):
        # init on a tiny window-multiple input: params are shape-independent
        # and init traces the non-fused (f32) path, which OOMs at the full
        # profiling batch
        small = jnp.zeros((1, 2 * args.ws, 2 * args.ws, inp.shape[-1]),
                          jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), small)
        params = variables["params"]
        if dt is not None:
            params = cast_floating(params, dt)
        fn = wrap_apply(lambda p_, t: mod.apply({"params": p_}, t), dt)

        @jax.jit
        def run(p_, t):
            # carry the tensor through the loop: each iteration consumes the
            # previous output, so XLA cannot hoist the (otherwise
            # loop-invariant) body out of the fori_loop — without this the
            # body runs once and every per-loop ms reads ~1/loops of truth
            def body(_, t_):
                return fn(p_, t_)
            out = jax.lax.fori_loop(0, args.loops, body, t)
            return jnp.mean(out)

        float(run(params, inp))         # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run(params, inp))
            times.append(time.perf_counter() - t0)
        ms = float(np.median(times)) / args.loops * 1e3
        print(json.dumps({"component": name, "ms": round(ms, 2),
                          "shape": list(inp.shape)}))

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    kw = dict(dim=c, num_heads=args.heads, window_size=args.ws,
              mlp_ratio=2.0)
    if want("hab"):
        timed("hab", HABClassic(shift_size=0, **kw), x)
    if want("hab_s"):
        timed("hab_s", HABClassic(shift_size=args.ws // 2, **kw), x)
    if want("cab"):
        timed("cab", CABClassic(num_feat=c, compress_ratio=3,
                                squeeze_factor=30), x)
    if want("norm1"):
        timed("norm1", nn.LayerNorm(epsilon=1e-5), x)
    if want("ocab"):
        timed("ocab", OCABClassic(dim=c, window_size=args.ws,
                                  overlap_ratio=0.5, num_heads=args.heads,
                                  mlp_ratio=2.0), x)
    if want("rhag_conv"):
        timed("rhag_conv", nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)]), x)

    # kernels in isolation
    if want("msa"):
        from super_resolution_tpu.ops.pallas_attention import fused_msa_block

        n = args.ws * args.ws
        d = c // args.heads
        wqkv = jnp.asarray(rng.random((c, 3 * c)), jnp.float32) * 0.05
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        wproj = jnp.asarray(rng.random((c, c)), jnp.float32) * 0.05
        bproj = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(rng.random((args.heads, n, n)), jnp.float32)
        mask = jnp.zeros((1, n, n), jnp.float32)
        xx = x.astype(dt) if dt is not None else x
        ww = (wqkv.astype(dt), bqkv.astype(dt), wproj.astype(dt),
              bproj.astype(dt)) if dt is not None else (wqkv, bqkv, wproj,
                                                       bproj)

        @jax.jit
        def run_msa(t, w1, b1, w2, b2):
            def body(_, t_):
                return fused_msa_block(t_, w1, b1, w2, b2, bias, mask,
                                       heads=args.heads, window_size=args.ws)
            out = jax.lax.fori_loop(0, args.loops, body, t)
            return jnp.mean(out).astype(jnp.float32)

        float(run_msa(xx, *ww))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run_msa(xx, *ww))
            times.append(time.perf_counter() - t0)
        print(json.dumps({"component": "msa", "ms": round(
            float(np.median(times)) / args.loops * 1e3, 2)}))

    if want("mlp"):
        from super_resolution_tpu.ops.pallas_ffn import mlp_block

        hid = int(c * 2.0)
        gam = jnp.ones((c,), jnp.float32)
        bet = jnp.zeros((c,), jnp.float32)
        w1 = jnp.asarray(rng.random((c, hid)), jnp.float32) * 0.05
        b1 = jnp.zeros((hid,), jnp.float32)
        w2 = jnp.asarray(rng.random((hid, c)), jnp.float32) * 0.05
        b2 = jnp.zeros((c,), jnp.float32)
        xx = x.astype(dt) if dt is not None else x
        args_mlp = [a.astype(dt) if dt is not None else a
                    for a in (gam, bet, w1, b1, w2, b2)]

        @jax.jit
        def run_mlp(t, *aa):
            def body(_, t_):
                return mlp_block(t_, *aa)
            out = jax.lax.fori_loop(0, args.loops, body, t)
            return jnp.mean(out).astype(jnp.float32)

        float(run_mlp(xx, *args_mlp))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(run_mlp(xx, *args_mlp))
            times.append(time.perf_counter() - t0)
        print(json.dumps({"component": "mlp", "ms": round(
            float(np.median(times)) / args.loops * 1e3, 2)}))


if __name__ == "__main__":
    main()
