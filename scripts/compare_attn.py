"""Attention-backend equivalence + latency harness.

Analog of the reference's FlexAttention-vs-Naive comparison
(ref: HAT/ESC/scripts/compare_attn.py:119-178): checks the Pallas fused
window-attention kernel against the XLA reference implementation on
identical inputs, then times both with the reference's protocol (warmup +
repeated timed runs, median).

Usage:
    python scripts/compare_attn.py [--windows 256] [--window-size 16]
                                   [--dim 180] [--heads 6] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=256)
    p.add_argument("--window-size", type=int, default=16)
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.ops.attention import (
        relative_position_index_sa, window_msa)
    from super_resolution_tpu.ops.pallas_attention import (
        window_attention_fused)

    n = args.window_size ** 2
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal(
        (3, args.windows, n, args.dim)).astype(np.float32))
    rpi = relative_position_index_sa(args.window_size)
    table = jnp.asarray(rng.standard_normal(
        ((2 * args.window_size - 1) ** 2, args.heads)).astype(np.float32)
        * 0.02)
    bias = table[rpi.reshape(-1)].reshape(n, n, args.heads) \
        .transpose(2, 0, 1)

    xla_fn = jax.jit(lambda q: window_msa(q, args.heads, bias))
    pallas_fn = jax.jit(
        lambda q: window_attention_fused(q, args.heads, bias))

    out_xla = np.asarray(xla_fn(qkv))
    try:
        out_pallas = np.asarray(pallas_fn(qkv))
        max_err = float(np.abs(out_xla - out_pallas).max())
    except Exception as e:  # pallas unavailable on this backend
        print(json.dumps({"error": f"pallas path failed: {e}"}))
        out_pallas, max_err = None, None

    def bench(fn):
        fn(qkv).block_until_ready()
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(qkv).block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    result = {
        "backend": jax.devices()[0].platform,
        "windows": args.windows, "window_size": args.window_size,
        "dim": args.dim, "heads": args.heads,
        "xla_ms": bench(xla_fn),
    }
    if out_pallas is not None:
        result["pallas_ms"] = bench(pallas_fn)
        result["max_abs_err"] = max_err
        result["speedup"] = result["xla_ms"] / result["pallas_ms"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
