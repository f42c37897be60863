"""Cumulative stage timing for the (fork) HAB front at the production
tile-batch shape — pinpoints where the XLA composition spends its time
(LN, CAB conv chain, ECA, ESC static/dynamic convs, aggregation).

Usage: python scripts/profile_hab.py [--batch 4] [--hw 320] [--dim 180]
           [--reps 3] [--dtype bf16]
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
    p.add_argument("--pdim", type=int, default=16)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.ops.conv import (conv2d_nhwc_s2d,
                                               dynamic_depthwise_conv3x3)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, hw, c, pdim = args.batch, args.hw, args.dim, args.pdim
    mid = c // 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)).astype(np.float32), dt)

    def mk(*shape, s=0.05):
        return jnp.asarray(
            rng.standard_normal(shape).astype(np.float32) * s, dt)

    w1, b1 = mk(3, 3, c, mid), mk(mid)
    w2, b2 = mk(3, 3, mid, c), mk(c)
    weca = mk(5, 1, 1)
    plk = mk(pdim, pdim, 13, 13, s=0.2)
    wd1, bd1 = mk(pdim, pdim // 2), mk(pdim // 2)
    wd3, bd3 = mk(pdim // 2, pdim * 9, s=0.0), mk(pdim * 9, s=0.0)
    ak, ab = mk(c, c), mk(c)

    def ln(t):
        mu = jnp.mean(t.astype(jnp.float32), axis=-1, keepdims=True)
        xd = t.astype(jnp.float32) - mu
        var = jnp.mean(xd * xd, axis=-1, keepdims=True)
        return (xd * jax.lax.rsqrt(var + 1e-5)).astype(t.dtype)

    def conv3(t, k, bias):
        return jax.lax.conv_general_dilated(
            t, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    def gelu(t):
        return 0.5 * t * (1.0 + jax.lax.erf(
            t.astype(jnp.float32) * (2.0 ** -0.5)).astype(t.dtype))

    def stage_fn(stage):
        def f(t):
            y = ln(t)
            if stage == "ln":
                return y
            cab = conv3(gelu(conv3(y, w1, b1)), w2, b2)
            if stage == "cab_convs":
                return cab
            g = jnp.mean(cab.astype(jnp.float32), axis=(1, 2))
            gate = jax.nn.sigmoid(jax.lax.conv_general_dilated(
                g[:, :, None].astype(dt), weca, (1,), [(2, 2)],
                dimension_numbers=("NWC", "WIO", "NWC"))[:, :, 0])
            cab = cab * gate[:, None, None, :].astype(dt)
            if stage == "eca":
                return cab
            x1 = y[..., :pdim]
            stat = conv2d_nhwc_s2d(x1, plk)
            if stage == "esc_stat":
                return cab.sum() + stat.sum()
            g16 = jnp.mean(x1.astype(jnp.float32), axis=(1, 2)).astype(dt)
            dk = (jax.nn.gelu(g16 @ wd1 + bd1) @ wd3 + bd3)
            dk = dk.reshape(-1, pdim, 3, 3).transpose(0, 2, 3, 1)
            dyn = dynamic_depthwise_conv3x3(x1, dk)
            if stage == "esc_dyn":
                return cab.sum() + stat.sum() + dyn.sum()
            y1 = stat + dyn
            attn = (jnp.einsum("bhwc,cd->bhwd", y1, ak[:pdim])
                    + jnp.einsum("bhwc,cd->bhwd", y[..., pdim:], ak[pdim:])
                    + ab)
            return t + attn + 0.01 * cab
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
    for stage in ["ln", "cab_convs", "eca", "esc_stat", "esc_dyn", "full"]:
        out[stage] = timeit(stage_fn(stage))
        print(json.dumps({stage: out[stage]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
