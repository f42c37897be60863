"""Attention-backend equivalence + latency harness.

Analog of the reference's FlexAttention-vs-Naive comparison
(ref: HAT/ESC/scripts/compare_attn.py:119-178): checks the Pallas fused
window-attention kernel against the slabbed-XLA production path on
identical inputs, then times both with the reference's protocol (warmup +
repeated timed runs, median). Covers the two shapes that matter
(VERDICT r1 #2): square ws^2 window MSA (HAB/ESC) and rectangular
16->24 OCAB attention, in f32 and bf16.

Usage:
    python scripts/compare_attn.py [--windows 2048] [--window-size 16]
        [--overlap 0.5 | --square] [--dim 180] [--heads 6]
        [--dtype bf16] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=2048,
                   help="window-batch size (8 HD tiles at ws16 = 3200)")
    p.add_argument("--window-size", type=int, default=16)
    p.add_argument("--overlap", type=float, default=0.5,
                   help="OCAB overlap ratio (rectangular Nk)")
    p.add_argument("--square", action="store_true",
                   help="square MSA (HAB/ESC) instead of OCAB")
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--slab", type=int, default=640)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.ops.attention import (
        attention_with_bias_auto, relative_position_index_oca,
        relative_position_index_sa)
    from super_resolution_tpu.ops.pallas_attention import fused_attention

    ws = args.window_size
    nq = ws * ws
    if args.square:
        nk = nq
        rpi = relative_position_index_sa(ws)
        table_rows = (2 * ws - 1) ** 2
    else:
        ow = ws + int(args.overlap * ws)
        nk = ow * ow
        rpi = relative_position_index_oca(ws, args.overlap)
        table_rows = (ws + ow - 1) ** 2

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    d = args.dim // args.heads
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(
        (args.windows, args.heads, nq, d)).astype(np.float32), dt)
    k = jnp.asarray(rng.standard_normal(
        (args.windows, args.heads, nk, d)).astype(np.float32), dt)
    v = jnp.asarray(rng.standard_normal(
        (args.windows, args.heads, nk, d)).astype(np.float32), dt)
    table = rng.standard_normal((table_rows, args.heads)).astype(np.float32) * 0.02
    bias = jnp.asarray(
        table[rpi.reshape(-1)].reshape(nq, nk, args.heads).transpose(2, 0, 1))

    from super_resolution_tpu.ops.pallas_attention import fused_attention_v3

    scale = d ** -0.5
    LOOP = 10  # amortize dispatch/tunnel latency inside one jit

    def looped(core):
        def run(a, b, c):
            def body(i, acc):
                # the (1 + eps*acc) factor creates a genuine sequential
                # dependency so the loop can't be collapsed; it adds one
                # cheap elementwise pass per iteration
                ai = a * (1 + 1e-12 * acc).astype(a.dtype)
                return jnp.mean(core(ai, b, c).astype(jnp.float32))
            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))
        return jax.jit(run)

    xla_fn = looped(lambda a, b, c: attention_with_bias_auto(
        a, b, c, bias, scale=scale, slab=args.slab))
    pallas_fn = looped(lambda a, b, c: fused_attention(
        a, b, c, bias, scale=scale))
    pallas3_fn = looped(lambda a, b, c: fused_attention_v3(
        a, b, c, bias, scale=scale))

    # correctness vs the unslabbed einsum on a small prefix
    from super_resolution_tpu.ops.attention import attention_with_bias
    small = slice(0, min(32, args.windows))
    ref = np.asarray(attention_with_bias(
        q[small], k[small], v[small], bias, scale=scale), np.float32)
    try:
        got = np.asarray(fused_attention(q[small], k[small], v[small], bias,
                                         scale=scale), np.float32)
        max_err = float(np.abs(ref - got).max())
        got3 = np.asarray(fused_attention_v3(q[small], k[small], v[small],
                                             bias, scale=scale), np.float32)
        max_err3 = float(np.abs(ref - got3).max())
    except Exception as e:  # pallas unavailable on this backend
        print(json.dumps({"error": f"pallas path failed: {e}"}))
        return

    def bench(fn):
        float(fn(q, k, v))  # compile + warmup (axon: fetch, don't block)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(q, k, v))
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3) / LOOP

    result = {
        "backend": jax.devices()[0].platform,
        "shape": f"{'MSA' if args.square else 'OCAB'} ws{ws} "
                 f"Nq{nq} Nk{nk} d{d} h{args.heads} bw{args.windows} "
                 f"{args.dtype}",
        "xla_ms": bench(xla_fn),
        "pallas_ms": bench(pallas_fn),
        "pallas_v3_ms": bench(pallas3_fn),
        "max_abs_err": max_err,
        "max_abs_err_v3": max_err3,
    }
    result["speedup"] = result["xla_ms"] / result["pallas_ms"]
    result["speedup_v3"] = result["xla_ms"] / result["pallas_v3_ms"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
