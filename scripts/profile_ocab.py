"""Cumulative stage timing for OCAB at the production tile-batch shape.

Each stage includes everything before it, so stage deltas are the true
marginal cost of each step inside one fused jit program (dispatch
amortized by a fori loop, as in profile_blocks).

Usage: python scripts/profile_ocab.py [--batch 4] [--hw 320] [--dim 180]
           [--heads 6] [--ws 16] [--overlap 0.5] [--dtype bf16] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = 10


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--hw", type=int, default=320)
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--ws", type=int, default=16)
    p.add_argument("--overlap", type=float, default=0.5)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from flax import linen as nn

    from super_resolution_tpu.ops.attention import (
        attention_with_bias_auto, relative_position_index_oca)
    from super_resolution_tpu.ops.windowing import (extract_overlap_windows,
                                                    window_partition,
                                                    window_reverse)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, hw, c, heads, ws = args.batch, args.hw, args.dim, args.heads, args.ws
    ow = ws + int(args.overlap * ws)
    d = c // heads
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)).astype(np.float32), dt)

    wq = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05, dt)
    wkv = jnp.asarray(
        rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.05, dt)
    wproj = jnp.asarray(
        rng.standard_normal((c, c)).astype(np.float32) * 0.05, dt)
    wm0 = jnp.asarray(
        rng.standard_normal((c, 2 * c)).astype(np.float32) * 0.05, dt)
    wm2 = jnp.asarray(
        rng.standard_normal((2 * c, c)).astype(np.float32) * 0.05, dt)
    rpi = relative_position_index_oca(ws, args.overlap)
    table = rng.standard_normal(
        ((ws + ow - 1) ** 2, heads)).astype(np.float32) * 0.02
    bias = jnp.asarray(table[rpi.reshape(-1)]
                       .reshape(ws * ws, ow * ow, heads).transpose(2, 0, 1))

    def ln(t):
        mu = jnp.mean(t.astype(jnp.float32), axis=-1, keepdims=True)
        xd = t.astype(jnp.float32) - mu
        var = jnp.mean(xd * xd, axis=-1, keepdims=True)
        return (xd * jax.lax.rsqrt(var + 1e-5)).astype(t.dtype)

    def stage_fn(stage):
        def f(t):
            y = ln(t)
            if stage == "ln":
                return y
            q = y @ wq
            kv = y @ wkv
            if stage == "proj":
                return q + kv[..., :c]
            qw = window_partition(q, ws).reshape(-1, ws * ws, c)
            kvw = extract_overlap_windows(kv, ws, ow)
            if stage == "gather":
                return qw.sum() + kvw.sum()
            bw = qw.shape[0]
            if stage in ("attn", "headsplit"):
                qh = qw.reshape(bw, ws * ws, heads, d).transpose(0, 2, 1, 3)
                kh = kvw[..., :c].reshape(bw, ow * ow, heads,
                                          d).transpose(0, 2, 1, 3)
                vh = kvw[..., c:].reshape(bw, ow * ow, heads,
                                          d).transpose(0, 2, 1, 3)
                if stage == "headsplit":
                    return qh.sum() + kh.sum() + vh.sum()
                out = attention_with_bias_auto(qh, kh, vh, bias,
                                               scale=d ** -0.5)
                out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)
            elif stage in ("attn_pallas", "full"):
                from super_resolution_tpu.ops.pallas_attention import \
                    fused_attention_ad
                qh = qw.reshape(bw, ws * ws, heads, d).transpose(0, 2, 1, 3)
                kh = kvw[..., :c].reshape(bw, ow * ow, heads,
                                          d).transpose(0, 2, 1, 3)
                vh = kvw[..., c:].reshape(bw, ow * ow, heads,
                                          d).transpose(0, 2, 1, 3)
                out = fused_attention_ad(qh, kh, vh, bias, d ** -0.5)
                out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)
            if stage in ("attn", "attn_pallas"):
                return out
            xr = window_reverse(out.reshape(-1, ws, ws, c), ws, hw, hw)
            xr = xr @ wproj + t
            return xr + (jax.nn.gelu(ln(xr) @ wm0) @ wm2)
        return f

    def mega_fn(full):
        from super_resolution_tpu.ops.pallas_attention import \
            fused_ocab_attention

        def f(t):
            y = ln(t)
            q = y @ wq
            kv = y @ wkv
            out = fused_ocab_attention(q, kv, bias, heads=heads,
                                       window_size=ws, overlap_win=ow)
            if not full:
                return out
            xr = out @ wproj + t
            return xr + (jax.nn.gelu(ln(xr) @ wm0) @ wm2)
        return f

    def timeit(core):
        def loop(t):
            def body(i, acc):
                ti = t * (1 + 1e-12 * acc).astype(t.dtype)
                return jnp.mean(core(ti).astype(jnp.float32))
            return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0))
        f = jax.jit(loop)
        float(f(x))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) * 1e3 / LOOP, 2)

    out = {"shape": f"({b},{hw},{hw},{c}) {args.dtype}"}
    for stage in ["ln", "proj", "gather", "headsplit", "attn",
                  "attn_pallas", "full"]:
        out[stage] = timeit(stage_fn(stage))
        print(json.dumps({stage: out[stage]}), flush=True)
    for name, f in [("mega_attn", mega_fn(False)), ("mega_full",
                                                    mega_fn(True))]:
        try:
            out[name] = timeit(f)
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {e}"[:160]
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
