"""Pallas fused window attention with relative position bias.

Replaces the reference's FlexAttention/SDPA dependency (ref:
hat/archs/esc_arch.py:234-240 — the perf-critical kernel per SURVEY.md
§2.6): one kernel computes softmax(q k^T * scale + bias) v for a batch of
windows without materializing the (N, N) score matrices in HBM.

Shapes are SR-scale: N = ws^2 is 64-1024 (ws 8-32) and head_dim is 16-32,
so a whole (window, head) problem fits VMEM — no flash-style KV streaming
is needed; the win is fusing QK^T + bias + softmax + PV into one VMEM-
resident pass and batching TW windows per program so the MXU sees
(TW*N, d) x (d, N) sized work. Scores accumulate in f32 (MXU native);
softmax runs on the VPU.

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
    q = q_ref[0]                       # (TW, Nq, d)
    k = k_ref[0]                       # (TW, Nk, d)
    v = v_ref[0]                       # (TW, Nk, d)
    b = bias_ref[0]                    # (Nq, Nk) — one head per program

    s = jax.lax.dot_general(
        q.astype(jnp.float32) * scale, k.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (TW, Nq, Nk)
    s = s + b.astype(jnp.float32)[None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (TW, Nq, d)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows", "interpret"))
def fused_attention(q, k, v, bias, *, scale: float | None = None,
                    block_windows: int = 8, interpret: bool | None = None):
    """Batched multi-head (optionally rectangular) window attention.

    Args:
      q: (BW, heads, Nq, d); k, v: (BW, heads, Nk, d)
      bias: (heads, Nq, Nk) additive bias (RPB, already gathered dense).
    Returns:
      (BW, heads, Nq, d)
    """
    bw, heads, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Cap the window count per pallas call: the (heads, BW, N, d) operand
    # layout the kernel wants forces XLA to materialize transposed copies of
    # q/k/v, so one giant call costs ~3x qkv in HBM. An outer lax.map over
    # window slabs bounds that to ~400 windows of copies at a time.
    slab = 512
    if bw > slab and not interpret:
        pad = (-bw) % slab
        if pad:
            padw = lambda a: jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
            q, k, v = padw(q), padw(k), padw(v)
        m = q.shape[0] // slab
        out = jax.lax.map(
            lambda qkv: fused_attention(qkv[0], qkv[1], qkv[2], bias,
                                        scale=scale,
                                        block_windows=block_windows,
                                        interpret=interpret),
            (q.reshape((m, slab) + q.shape[1:]),
             k.reshape((m, slab) + k.shape[1:]),
             v.reshape((m, slab) + v.shape[1:])))
        return out.reshape((m * slab,) + out.shape[2:])[:bw]

    # fit the per-program working set in scoped VMEM (~16MB): scores (twice:
    # s and p), q/k/v/out with the head dim padded to a full 128 lane
    dpad = max(d, 128)
    per_window = 4 * (2 * nq * nk + 3 * nk * dpad + 2 * nq * dpad)
    budget = 10 * 1024 * 1024
    tw = max(1, min(block_windows, bw, budget // per_window))
    pad = (-bw) % tw
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
        k = jnp.concatenate([k, jnp.zeros((pad,) + k.shape[1:], k.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
    bw_p = q.shape[0]

    # (heads, BW, N, d) layout so each program reads contiguous windows
    qt = q.transpose(1, 0, 2, 3)
    kt = k.transpose(1, 0, 2, 3)
    vt = v.transpose(1, 0, 2, 3)

    grid = (heads, bw_p // tw)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tw, nq, d), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, nk, d), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tw, nk, d), lambda h, w: (h, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, nk), lambda h, w: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tw, nq, d), lambda h, w: (h, w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((heads, bw_p, nq, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, bias)

    out = out.transpose(1, 0, 2, 3)
    return out[:bw]


def window_attention_fused(qkv_windows, num_heads: int, bias,
                           scale: float | None = None):
    """Drop-in for ops.attention.window_msa: qkv (3, BW, N, C) ->
    (BW, N, C)."""
    _, bw, n, c = qkv_windows.shape
    d = c // num_heads
    qkv = qkv_windows.reshape(3, bw, n, num_heads, d).transpose(0, 1, 3, 2, 4)
    out = fused_attention(qkv[0], qkv[1], qkv[2], bias, scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)
