"""Benchmark the fused Pallas gated-dconv FFN vs the XLA composition.

Production shape default: the bench tile chunk (B8, 320x320, C=180,
mlp_ratio 2 -> hidden 360, 2M=720). Prints per-call ms for each path and
the max abs difference.

Usage: python scripts/compare_ffn.py [--batch 8] [--hw 320] [--dim 180]
           [--ratio 2.0] [--dtype bf16] [--reps 5] [--tile-rows 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=320)
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--ratio", type=float, default=2.0)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tile-rows", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.ops.pallas_ffn import (ffn_reference,
                                                     gated_dconv_ffn)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, hw, c = args.batch, args.hw, args.dim
    m = int(c * args.ratio)
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) *
                           0.05).astype(dt)

    x = mk(b, hw, hw, c)
    w1, b1 = mk(c, 2 * m), mk(2 * m)
    wd, bd = mk(3, 3, 2 * m), mk(2 * m)
    w2, b2 = mk(m, c), mk(c)

    LOOP = 10  # amortize dispatch/tunnel latency (profile_blocks protocol)

    def make(core):
        def loop(x, *wts):
            y = jax.lax.fori_loop(0, LOOP, lambda i, t: core(t, *wts), x)
            return jnp.mean(y.astype(jnp.float32))
        return jax.jit(loop)

    xla = make(ffn_reference)
    fused = make(lambda *a: gated_dconv_ffn(*a, tile_rows=args.tile_rows))
    xla_once = jax.jit(ffn_reference)
    fused_once = jax.jit(
        lambda *a: gated_dconv_ffn(*a, tile_rows=args.tile_rows))

    def bench(fn, once, label):
        out = once(x, w1, b1, wd, bd, w2, b2)
        float(fn(x, w1, b1, wd, bd, w2, b2))  # compile + block
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(x, w1, b1, wd, bd, w2, b2))
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {1e3 * float(np.median(ts)) / LOOP:.2f} ms")
        return out

    ref = bench(xla, xla_once, "xla  ")
    got = bench(fused, fused_once, "pallas")
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    print(f"max|diff| = {err:.3e}")

    # full HAB mlp-residual block: x + FFN(LN(x))
    from super_resolution_tpu.ops.pallas_ffn import (ffn_block_reference,
                                                     gated_dconv_ffn_block)

    gamma, beta = mk(c), mk(c)

    def blk_core(fused_):
        def f(x, *wts):
            if fused_:
                return gated_dconv_ffn_block(x, gamma, beta, *wts,
                                             tile_rows=args.tile_rows)
            return ffn_block_reference(x, gamma, beta, *wts)
        return f

    refb = bench(make(blk_core(False)), jax.jit(blk_core(False)),
                 "xla   block")
    gotb = bench(make(blk_core(True)), jax.jit(blk_core(True)),
                 "pallas block")
    errb = float(jnp.max(jnp.abs(refb.astype(jnp.float32) -
                                 gotb.astype(jnp.float32))))
    print(f"block max|diff| = {errb:.3e}")


if __name__ == "__main__":
    main()
