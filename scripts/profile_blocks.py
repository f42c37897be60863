"""Per-component timing for the fork-HAT hot path on the current backend.

Times each sub-module on the production tile-batch shape with the bench
protocol (compile, then median of timed reps, axon-safe scalar fetch) so
optimization effort lands where the time actually is. Components:

  hab        one HAB block (x depth per layer in the full model)
  hab_cab    CAB branch only
  hab_esc    ESC conv-attention branch only
  hab_ffn    GatedDconvFFN only
  hab_norm   the two LayerNorms only
  ocab       one OCAB block
  rhag_conv  the per-RHAG 3x3 conv
  full       whole flagship model forward

Usage: python scripts/profile_blocks.py [--batch 8] [--hw 320]
           [--dtype bf16] [--reps 5] [--only hab,ocab,...]
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
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, default=320)
    p.add_argument("--dim", type=int, default=180)
    p.add_argument("--heads", type=int, default=6)
    p.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--only", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.models.hat_arch import (CAB, HAB, HAT, OCAB,
                                                      ESCConvAttn,
                                                      GatedDconvFFN)
    from super_resolution_tpu.utils.precision import cast_floating, wrap_apply
    from flax import linen as nn

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b, hw, dim = args.batch, args.hw, args.dim
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, dim)).astype(np.float32))

    class _Norms(nn.Module):
        @nn.compact
        def __call__(self, y):
            return nn.LayerNorm(name="a")(nn.LayerNorm(name="b")(y))

    class _Copy(nn.Module):
        """Floor: one read-modify-write pass over the activation."""

        @nn.compact
        def __call__(self, y):
            return y * 1.000001

    from super_resolution_tpu.ops.conv import (conv2d_nhwc,
                                               dynamic_depthwise_conv3x3)

    class _PLK(nn.Module):
        """13x13 dense conv on the first 16 channels (ESC static branch)."""

        @nn.compact
        def __call__(self, y):
            f = self.param("f", nn.initializers.normal(0.02), (16, 16, 13, 13))
            out = conv2d_nhwc(y[..., :16], f.astype(y.dtype))
            return jnp.concatenate([out, y[..., 16:]], axis=-1)

    class _Dyn(nn.Module):
        """per-sample dynamic depthwise 3x3 on 16 channels (ESC dynamic)."""

        @nn.compact
        def __call__(self, y):
            k = self.param("k", nn.initializers.normal(0.02), (1, 3, 3, 16))
            b = y.shape[0]
            dk = jnp.broadcast_to(k.astype(y.dtype), (b, 3, 3, 16))
            out = dynamic_depthwise_conv3x3(y[..., :16], dk)
            return jnp.concatenate([out, y[..., 16:]], axis=-1)

    class _Dense720(nn.Module):
        """fc 180->720->180 (FFN matmul mass without the dw conv)."""

        @nn.compact
        def __call__(self, y):
            h = nn.Dense(720, name="up")(y)
            return nn.Dense(y.shape[-1], name="dn")(h)

    class _DW720(nn.Module):
        """3x3 depthwise at FFN width, projected back."""

        @nn.compact
        def __call__(self, y):
            h = nn.Dense(720, name="up")(y)
            h = nn.Conv(720, (3, 3), padding=[(1, 1)] * 2,
                        feature_group_count=720, name="dw")(h)
            return nn.Dense(y.shape[-1], name="dn")(h)

    mods = {
        "floor": _Copy(),
        "esc_plk": _PLK(),
        "esc_dyn": _Dyn(),
        "ffn_dense": _Dense720(),
        "ffn_dense_dw": _DW720(),
        "conv3x3": nn.Conv(dim, (3, 3), padding=[(1, 1)] * 2),
        "hab": HAB(dim=dim, num_heads=args.heads, window_size=16,
                   compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
                   mlp_ratio=2.0),
        "hab_cab": CAB(num_feat=dim, compress_ratio=3),
        "hab_esc": ESCConvAttn(dim=dim),
        "hab_ffn": GatedDconvFFN(dim=dim, mlp_ratio=2.0),
        "hab_norm": _Norms(),
        "ocab": OCAB(dim=dim, window_size=16, overlap_ratio=0.5,
                     num_heads=args.heads, mlp_ratio=2.0),
        "rhag_conv": nn.Conv(dim, (3, 3), padding=[(1, 1), (1, 1)]),
    }
    only = set(args.only.split(",")) if args.only else None

    LOOP = 8  # on-device iterations per timed call (amortizes the axon
              # tunnel dispatch latency, which swamps <50ms components)

    def timeit(fn, *a):
        float(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3) / LOOP

    results = {"backend": jax.devices()[0].platform,
               "shape": f"({b},{hw},{hw},{dim}) {args.dtype}"}
    print(json.dumps(results), flush=True)
    for name, mod in mods.items():
        if only and name not in only:
            continue
        try:
            params = mod.init(jax.random.PRNGKey(0), x).get("params", {})
            if dt != jnp.float32:
                params = cast_floating(params, dt)

            def loop(p, t, m=mod):
                t = t.astype(dt)
                t = jax.lax.fori_loop(
                    0, LOOP, lambda i, y: m.apply({"params": p}, y), t)
                return jnp.mean(t.astype(jnp.float32))

            f = jax.jit(loop)
            results[name + "_ms"] = round(timeit(f, params, x), 3)
        except Exception as e:
            results[name + "_ms"] = f"failed: {type(e).__name__}: {e}"[:200]
        print(json.dumps({name: results[name + "_ms"]}), flush=True)

    if only is not None and "full" in only:
        net = HAT(img_size=64, embed_dim=dim, depths=(6,) * 6,
                  num_heads=(args.heads,) * 6, window_size=16,
                  compress_ratio=3, squeeze_factor=30, conv_scale=0.01,
                  overlap_ratio=0.5, mlp_ratio=2.0, upscale=4,
                  upsampler="pixelshuffle")
        x3 = jnp.asarray(
            rng.standard_normal((b, hw, hw, 3)).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
        if dt != jnp.float32:
            params = cast_floating(params, dt)
        fwd = wrap_apply(lambda p, t: net.apply({"params": p}, t), dt)
        f = jax.jit(lambda p, t: jnp.mean(fwd(p, t)))
        results["full_ms"] = round(timeit(f, params, x3), 3)
        # model accounting at these dims: 36 HAB + 6 OCAB + 6 rhag convs
        if "hab_ms" in results and "ocab_ms" in results:
            acct = (36 * results["hab_ms"] + 6 * results["ocab_ms"]
                    + 6 * results.get("rhag_conv_ms", 0.0))
            results["accounted_ms"] = round(acct, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
