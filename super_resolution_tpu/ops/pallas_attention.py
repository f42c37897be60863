"""Pallas fused window attention with relative position bias.

Replaces the reference's FlexAttention/SDPA dependency (ref:
hat/archs/esc_arch.py:234-240 — the perf-critical kernel per SURVEY.md
§2.6): one kernel computes softmax(q k^T * scale + bias) v for a batch of
windows without materializing the (N, N) score matrices in HBM.

Shapes are SR-scale: N = ws^2 is 64-1024 (ws 8-32) and head_dim is 16-32,
so a whole (window, head) problem fits VMEM — no flash-style KV streaming
is needed; the win over the slabbed-XLA path (ops/attention.py) is purely
HBM traffic: XLA materializes the f32 score tensor twice (write + read ~
4.7 MB per window-head at OCAB 16->24 shapes) while this kernel keeps
scores VMEM-resident.

v2 design notes (the v1 kernel lost to XLA on v5e; these fix why):
- operands stay in their input dtype through the MXU (bf16 matmuls run at
  full rate with f32 accumulation via preferred_element_type; v1 upcast to
  f32 first, forcing multi-pass f32 MXU work);
- no operand pre-transpose: BlockSpec index maps walk the native
  (BW, heads, N, d) layout, so nothing is copied in HBM (v1's
  (heads, BW, N, d) transposes tripled HBM traffic);
- grid = (heads, window-blocks) with the bias block constant along the
  inner grid axis — Mosaic hoists its DMA out of the inner loop.

Supports rectangular attention (Nq != Nk) for OCAB's ws^2-query /
overlap-window-key pattern (ref: hat_arch.py:374-384).

The XLA path (ops/attention.py) is the correctness reference; parity is
pinned by tests/test_pallas_attention.py. On non-TPU backends the kernel
runs in interpreter mode (slow, tests only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[:, 0]                    # (TW, Nq, d) input dtype
    k = k_ref[:, 0]                    # (TW, Nk, d)
    v = v_ref[:, 0]                    # (TW, Nk, d)
    b = bias_ref[0]                    # (Nq, Nk) — one head per program

    # bf16 x bf16 -> f32 on the MXU; scale folded into the f32 scores
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (TW, Nq, Nk) f32
    s = s * scale + b.astype(jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (TW, Nq, d) f32
    o_ref[:, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows", "interpret"))
def fused_attention(q, k, v, bias, *, scale: float | None = None,
                    block_windows: int = 16, interpret: bool | None = None):
    """Batched multi-head (optionally rectangular) window attention.

    Args:
      q: (BW, heads, Nq, d); k, v: (BW, heads, Nk, d) — f32 or bf16.
      bias: (heads, Nq, Nk) additive bias (RPB, already gathered dense).
    Returns:
      (BW, heads, Nq, d) in the input dtype.
    """
    bw, heads, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Per-program working set in VMEM (~16MB budget, keep headroom for
    # double buffering): f32 scores (s/p may share a buffer but budget both),
    # qkv/out blocks in input dtype with d padded to the 128 lane.
    esize = jnp.dtype(q.dtype).itemsize
    dpad = max(d, 128)
    per_window = (8 * nq * nk                       # scores f32 (x2)
                  + esize * (2 * nk * dpad + nq * dpad)   # k, v, q
                  + 4 * nq * dpad)                  # out accum
    budget = 9 * 1024 * 1024 - 4 * nq * nk          # minus the bias block
    tw = max(1, min(block_windows, bw, budget // per_window))
    pad = (-bw) % tw
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
        k = jnp.concatenate([k, jnp.zeros((pad,) + k.shape[1:], k.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
    bw_p = q.shape[0]

    grid = (heads, bw_p // tw)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tw, 1, nq, d), lambda h, w: (w, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, 1, nk, d), lambda h, w: (w, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, 1, nk, d), lambda h, w: (w, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, nk), lambda h, w: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, 1, nq, d), lambda h, w: (w, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw_p, heads, nq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)

    return out[:bw]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention_ad(q, k, v, bias, scale):
    """fused_attention with a defined backward pass: Pallas forward, XLA
    backward (differentiating through pallas_call is unsupported; the
    backward recomputes scores through the reference einsum path — training
    shapes are 64x64-crop sized, where that is cheap)."""
    return fused_attention(q, k, v, bias, scale=scale)


def _fused_ad_fwd(q, k, v, bias, scale):
    return fused_attention(q, k, v, bias, scale=scale), (q, k, v, bias)


def _fused_ad_bwd(scale, res, g):
    from super_resolution_tpu.ops.attention import attention_with_bias

    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: attention_with_bias(q_, k_, v_, b_,
                                                   scale=scale),
        q, k, v, bias)
    return vjp(g.astype(q.dtype))


fused_attention_ad.defvjp(_fused_ad_fwd, _fused_ad_bwd)


def window_attention_fused(qkv_windows, num_heads: int, bias,
                           scale: float | None = None):
    """Drop-in for ops.attention.window_msa: qkv (3, BW, N, C) ->
    (BW, N, C)."""
    _, bw, n, c = qkv_windows.shape
    d = c // num_heads
    qkv = qkv_windows.reshape(3, bw, n, num_heads, d).transpose(0, 1, 3, 2, 4)
    out = fused_attention(qkv[0], qkv[1], qkv[2], bias, scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)
