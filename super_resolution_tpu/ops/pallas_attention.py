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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# windows per fused_msa_block program (experiments only; wb=1 measured
# fastest on v5e — see README). Read once here so the knob is deterministic.
_DEFAULT_MSA_WB = int(os.environ.get("SR_MSA_WB", "1"))


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


def _attn_kernel_v3(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                    heads: int):
    """All heads per program; per-(window, head) scores live in one small
    reused f32 register block, so the window block (tw) can be chosen by
    the k/v footprint instead of by a (tw, heads, Nq, Nk) score tensor."""
    tw = q_ref.shape[0]
    for w in range(tw):
        for h in range(heads):
            q = q_ref[w, h]                      # (Nq, d)
            k = k_ref[w, h]                      # (Nk, d)
            v = v_ref[w, h]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Nq, Nk) f32
            s = s * scale + bias_ref[h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (Nq, d)
            o_ref[w, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows",
                                             "interpret"))
def fused_attention_v3(q, k, v, bias, *, scale: float | None = None,
                       block_windows: int = 0, interpret: bool | None = None):
    """v3: grid over window blocks only; q/k/v for ALL heads fetched once
    per program (v2 re-fetched k/v per head via the head grid axis), and
    the f32 score buffer is (Nq, Nk) for one pair at a time, so tw is set
    by the k/v VMEM footprint. Fewer, fatter programs.

    Shapes as fused_attention. block_windows 0 = auto.
    """
    bw, heads, nq, d = q.shape
    nk = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    esize = jnp.dtype(q.dtype).itemsize
    dpad = max(-(-d // 128) * 128, 128)
    # per-window VMEM: q/k/v/out lane-padded blocks x double buffering
    per_window = heads * esize * 2 * (nq * dpad + 2 * nk * dpad + nq * dpad)
    # minus the resident f32 bias block and two (Nq, Nk) f32 score buffers
    budget = 11 * 1024 * 1024 - 4 * heads * nq * nk - 8 * nq * nk
    tw = block_windows or max(1, budget // per_window)
    tw = min(tw, bw)
    pad = (-bw) % tw
    if pad:
        q = jnp.concatenate([q, jnp.zeros((pad,) + q.shape[1:], q.dtype)])
        k = jnp.concatenate([k, jnp.zeros((pad,) + k.shape[1:], k.dtype)])
        v = jnp.concatenate([v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
    bw_p = q.shape[0]

    grid = (bw_p // tw,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_v3, scale=scale, heads=heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tw, heads, nq, d), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, heads, nk, d), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, heads, nk, d), lambda w: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, nq, nk), lambda w: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, heads, nq, d), lambda w: (w, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bw_p, heads, nq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)

    return out[:bw]


def _ocab_kernel(q_ref, kv_ref, bias_ref, o_ref, *, heads: int, ws: int,
                 ow: int, scale: float):
    c = q_ref.shape[-1]
    d = c // heads
    q = q_ref[0].reshape(ws * ws, c)                 # (Nq, C)
    kv = kv_ref[0].reshape(ow * ow, 2 * c)           # (Nk, 2C)
    outs = []
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = kv[:, h * d:(h + 1) * d]
        vh = kv[:, c + h * d:c + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (Nq, Nk) f32
        s = s * scale + bias_ref[h].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(kv.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))     # (Nq, d)
    o = jnp.concatenate(outs, axis=-1)               # (Nq, C)
    o_ref[0] = o.reshape(ws, ws, c).astype(o_ref.dtype)


def bias_attention_supported(nq: int, nk: int, heads: int) -> bool:
    """Scoped-VMEM bound for the kernels that hold the full
    (heads, nq, nk) f32 bias block plus a per-head f32 score/softmax pair
    resident per program (OCAB / PSA routes). Mosaic's scoped stack is
    ~16 MB/core on v5e; bound analytically so oversized windows fall back
    to the XLA path instead of failing AOT compile (same boundary class
    msa_block_supported pins for the square kernels)."""
    return (heads * 4 + 8) * nq * nk <= 14 * 2 ** 20


def ocab_attention_supported(window_size: int, overlap_win: int,
                             heads: int) -> bool:
    """Mosaic needs the Element-indexed kv block's sublane dim (ow)
    divisible by 8; ws must divide the image (caller pads). Both OCAB
    kernels also hold the full (heads, ws^2, ow^2) f32 bias block in
    scoped VMEM — e.g. ws 32 / ow 48 (bias alone 54 MB at 6 heads) must
    fall back to the XLA path."""
    if overlap_win % 8 or window_size % 8:
        return False
    return bias_attention_supported(window_size ** 2, overlap_win ** 2,
                                    heads)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "overlap_win", "scale",
                                             "interpret"))
def fused_ocab_attention(q_img, kv_img, bias, *, heads: int,
                         window_size: int, overlap_win: int,
                         scale: float | None = None,
                         interpret: bool | None = None):
    """Whole OCAB attention middle on images, windowing done in VMEM.

    Replaces the chain  window_partition(q) -> extract_overlap_windows(kv)
    -> per-head transposes -> attention -> head merge -> window_reverse
    (ref: hat_arch.py:326-393) with ONE kernel: q is read as ws x ws image
    blocks, kv as overlapping ow x ow blocks via pl.Element start indices
    into the zero-padded kv image, heads are lane slices, and the output
    is written back in image layout. None of the (BW, Nk, 2C) overlap
    tensor, its head-split transposes, or the window_reverse copy ever
    touch HBM — measured 23 + ~28 + ~7 ms of pure layout traffic per OCAB
    at the production tile batch (scripts/profile_ocab.py).

    Args:
      q_img:  (B, H, W, C) q projection, H and W multiples of window_size.
      kv_img: (B, H, W, 2C) kv projection (K = channels [0, C), V = rest).
      bias:   (heads, ws^2, ow^2) f32.
    Returns:
      (B, H, W, C) attention output in image layout (pre-window_reverse
      equivalent already applied).
    """
    b, h_img, w_img, c = q_img.shape
    ws, ow = window_size, overlap_win
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = (ow - ws) // 2
    kv_pad = jnp.pad(kv_img, ((0, 0), (p, p), (p, p), (0, 0)))
    nwy, nwx = h_img // ws, w_img // ws

    grid = (b, nwy, nwx)
    out = pl.pallas_call(
        functools.partial(_ocab_kernel, heads=heads, ws=ws, ow=ow,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, ws, c), lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(ow), pl.Element(ow),
                          pl.Element(2 * c)),
                         lambda bb, i, j, _ws=ws: (bb, i * _ws, j * _ws, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, ws * ws, ow * ow),
                         lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, c),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), q_img.dtype),
        interpret=interpret,
    )(q_img, kv_pad, bias)
    return out


def ocab_attention_reference(q_img, kv_img, bias, heads: int,
                             window_size: int, overlap_win: int,
                             scale: float | None = None):
    """XLA oracle/backward for fused_ocab_attention."""
    from super_resolution_tpu.ops.attention import attention_with_bias
    from super_resolution_tpu.ops.windowing import (extract_overlap_windows,
                                                    window_partition,
                                                    window_reverse)

    b, h_img, w_img, c = q_img.shape
    ws, ow = window_size, overlap_win
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    qw = window_partition(q_img, ws).reshape(-1, ws * ws, c)
    kvw = extract_overlap_windows(kv_img, ws, ow)
    bw = qw.shape[0]
    qh = qw.reshape(bw, ws * ws, heads, d).transpose(0, 2, 1, 3)
    kh = kvw[..., :c].reshape(bw, ow * ow, heads, d).transpose(0, 2, 1, 3)
    vh = kvw[..., c:].reshape(bw, ow * ow, heads, d).transpose(0, 2, 1, 3)
    out = attention_with_bias(qh, kh, vh, bias, scale=scale)
    out = out.transpose(0, 2, 1, 3).reshape(bw, ws * ws, c)
    return window_reverse(out.reshape(-1, ws, ws, c), ws, h_img, w_img)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_ocab_attention_ad(q_img, kv_img, bias, heads, window_size,
                            overlap_win, scale):
    """Fused OCAB attention forward, XLA backward."""
    return fused_ocab_attention(q_img, kv_img, bias, heads=heads,
                                window_size=window_size,
                                overlap_win=overlap_win, scale=scale)


def _ocab_ad_fwd(q_img, kv_img, bias, heads, window_size, overlap_win,
                 scale):
    return (fused_ocab_attention(q_img, kv_img, bias, heads=heads,
                                 window_size=window_size,
                                 overlap_win=overlap_win, scale=scale),
            (q_img, kv_img, bias))


def _ocab_ad_bwd(heads, window_size, overlap_win, scale, res, g):
    q_img, kv_img, bias = res
    _, vjp = jax.vjp(
        lambda a, b_, c_: ocab_attention_reference(
            a, b_, c_, heads, window_size, overlap_win, scale),
        q_img, kv_img, bias)
    return vjp(g.astype(q_img.dtype))


fused_ocab_attention_ad.defvjp(_ocab_ad_fwd, _ocab_ad_bwd)


def _msa_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, heads: int, ws: int,
                scale: float, wb: int):
    c = o_ref.shape[-1]
    d = c // heads
    n = ws * ws
    for w_i in range(wb):                 # wb windows per program along x
        x = qkv_ref[0, :, w_i * ws:(w_i + 1) * ws].reshape(n, 3 * c)
        m = mask_ref[w_i].astype(jnp.float32)
        outs = []
        for h in range(heads):
            q = x[:, h * d:(h + 1) * d]
            k = x[:, c + h * d:c + (h + 1) * d]
            v = x[:, 2 * c + h * d:2 * c + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h].astype(jnp.float32) + m
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(x.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)
        o_ref[0, :, w_i * ws:(w_i + 1) * ws] = \
            o.reshape(ws, ws, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "scale", "interpret"))
def fused_msa_attention(qkv_img, bias, mask, *, heads: int, window_size: int,
                        scale: float | None = None,
                        interpret: bool | None = None):
    """Whole (S)W-MSA middle on images: window partition, head split,
    attention (+RPB, + optional shift mask) and window reverse in VMEM.

    The classic HAT / SwinIR path (ref: swinir_arch.py:95-192,
    hat/archs/hat_arch.py window-MSA structure) otherwise pays HBM copies
    for the window partition, the qkv head-split transposes, the output
    merge, and window_reverse — same layout-traffic class the OCAB
    megakernel eliminated.

    Args:
      qkv_img: (B, H, W, 3C) fused qkv projection of the (already
        shifted, if shift_size>0) image; H, W multiples of window_size.
      bias: (heads, N, N) f32 RPB, N = ws^2.
      mask: (nW, N, N) f32 additive shift mask (nW = (H/ws)*(W/ws)), or
        (1, N, N) zeros when not shifted.
    Returns:
      (B, H, W, C) attention output in image layout.
    """
    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    ws = window_size
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nwy, nwx = h_img // ws, w_img // ws
    n = ws * ws
    masked = mask.shape[0] != 1
    # wb windows per program along x. Measured on v5e (classic HAT bench):
    # wb=2 is SLOWER (6.59 vs 6.82 out-Mpix/s) — the in-kernel sublane
    # column slices and the serialized per-window loop cost more than the
    # per-program overhead they save; default stays 1.
    wb = 1
    mask_blk = mask if masked else jnp.zeros((wb, n, n), jnp.float32)
    grid = (b, nwy, nwx // wb)
    out = pl.pallas_call(
        functools.partial(_msa_kernel, heads=heads, ws=ws, scale=scale,
                          wb=wb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, wb * ws, c3),
                         lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, n),
                         (lambda bb, i, j, _x=nwx, _w=wb:
                          (i * (_x // _w) + j, 0, 0))
                         if masked else (lambda bb, i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wb * ws, c),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), qkv_img.dtype),
        interpret=interpret,
    )(qkv_img, bias, mask_blk)
    return out


def msa_attention_reference(qkv_img, bias, mask, heads: int,
                            window_size: int, scale: float | None = None):
    """XLA oracle/backward for fused_msa_attention."""
    from super_resolution_tpu.ops.attention import attention_with_bias
    from super_resolution_tpu.ops.windowing import (window_partition,
                                                    window_reverse)

    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    ws = window_size
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    xw = window_partition(qkv_img, ws).reshape(-1, ws * ws, c3)
    bw, n, _ = xw.shape
    qkv = xw.reshape(bw, n, 3, heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    full_bias = bias[None]                                  # (1, heads, N, N)
    if mask.shape[0] != 1:
        nw = mask.shape[0]
        full_bias = bias[None, None] + mask[None, :, None]
        q = q.reshape(bw // nw, nw, heads, n, d)
        k = k.reshape(bw // nw, nw, heads, n, d)
        v = v.reshape(bw // nw, nw, heads, n, d)
        out = attention_with_bias(q, k, v, full_bias, scale=scale)
        out = out.reshape(bw, heads, n, d)
    else:
        out = attention_with_bias(q, k, v, full_bias + mask[:1, None],
                                  scale=scale)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    return window_reverse(out.reshape(-1, ws, ws, c), ws, h_img, w_img)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_msa_attention_ad(qkv_img, bias, mask, heads, window_size, scale):
    """Fused MSA forward, XLA backward."""
    return fused_msa_attention(qkv_img, bias, mask, heads=heads,
                               window_size=window_size, scale=scale)


def _msa_ad_fwd(qkv_img, bias, mask, heads, window_size, scale):
    return (fused_msa_attention(qkv_img, bias, mask, heads=heads,
                                window_size=window_size, scale=scale),
            (qkv_img, bias, mask))


def _msa_ad_bwd(heads, window_size, scale, res, g):
    qkv_img, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b_, m_: msa_attention_reference(a, b_, m_, heads,
                                                  window_size, scale),
        qkv_img, bias, mask)
    return vjp(g.astype(qkv_img.dtype))


fused_msa_attention_ad.defvjp(_msa_ad_fwd, _msa_ad_bwd)


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


def _ocab_block_kernel(x_ref, xov_ref, lns_ref, lnb_ref, wq_ref, bq_ref,
                       wkv_ref, bkv_ref, wproj_ref, bproj_ref, bias_ref,
                       o_ref, *, heads: int, ws: int, ow: int, scale: float,
                       h_img: int, w_img: int, ln_eps: float,
                       residual_scale: float = 1.0):
    c = x_ref.shape[-1]
    # cq < c when the caller passes a head-group weight slice (the
    # head-parallel TP worker, parallel/tp_attention.py); the LN and the
    # residual stay full-C
    cq = wq_ref.shape[1]
    d = cq // heads
    n = ws * ws
    nk = ow * ow
    pad = (ow - ws) // 2
    i = pl.program_id(1)
    j = pl.program_id(2)

    def _ln(t):
        t = t.astype(jnp.float32)
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(t - mu), axis=-1, keepdims=True)
        tn = (t - mu) * jax.lax.rsqrt(var + ln_eps)
        return tn * lns_ref[0].astype(jnp.float32) + \
            lnb_ref[0].astype(jnp.float32)

    x_raw = x_ref[0].reshape(n, c)
    xq = _ln(x_raw).astype(x_raw.dtype)
    xov = _ln(xov_ref[0].reshape(nk, c)).astype(x_raw.dtype)

    q = jax.lax.dot_general(
        xq, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q = (q + bq_ref[0].astype(jnp.float32)).astype(x_raw.dtype)    # (N, C)
    kv = jax.lax.dot_general(
        xov, wkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    kv = kv + bkv_ref[0].astype(jnp.float32)                       # (Nk, 2C)
    # The reference zero-pads the PROJECTED kv at image borders
    # (extract_overlap_windows semantics); computing kv from a zero-padded
    # raw image would instead leave LN/projection biases there, so mask
    # out-of-image rows explicitly.
    # validity mask built directly in (Nk, 1) layout — a (ow, ow) ->
    # (Nk, 1) reshape would collapse lanes into sublanes, which Mosaic
    # rejects ("unsupported shape cast")
    idx = jax.lax.broadcasted_iota(jnp.int32, (nk, 1), 0)
    yy = idx // ow + i * ws - pad
    xx = idx % ow + j * ws - pad
    valid = ((yy >= 0) & (yy < h_img) & (xx >= 0) & (xx < w_img))
    kv = jnp.where(valid, kv, 0.0).astype(x_raw.dtype)

    outs = []
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = kv[:, h * d:(h + 1) * d]
        vh = kv[:, cq + h * d:cq + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[h].astype(jnp.float32)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(x_raw.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x_raw.dtype)         # (N, cq)
    o = jax.lax.dot_general(
        o, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    res = x_raw.astype(jnp.float32)
    if residual_scale != 1.0:
        res = res * residual_scale
    o = o + bproj_ref[0].astype(jnp.float32) + res
    o_ref[0] = o.reshape(ws, ws, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "overlap_win", "scale",
                                             "ln_eps", "interpret",
                                             "residual_scale"))
def fused_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                     w_proj, b_proj, bias, *, heads: int, window_size: int,
                     overlap_win: int, scale: float | None = None,
                     ln_eps: float = 1e-5, interpret: bool | None = None,
                     residual_scale: float = 1.0):
    """The WHOLE OCAB attention half in one kernel: LN1, q/kv projections,
    overlap windowing, rectangular attention with gathered RPB, output
    projection and the shortcut residual.

    vs fused_ocab_attention (which still read materialized q (C) + padded
    kv (2C, refetched ~2.25x by the overlap) and wrote a pre-proj C image):
    this reads the raw C image (1 + ~2.25x for the overlap block), computes
    everything else in VMEM, and writes C once. The kv projection is
    recomputed per overlapping window — ~2.25x its matmul FLOPs — which is
    far cheaper than its HBM round-trip at SR channel counts. OCAB's norm1
    feeds only this branch (unlike HAB, whose LN also feeds the CAB), so
    the LN folds in for free and the XLA-side x_norm image disappears.

    Args:
      x_img: (B, H, W, C) RAW block input (pre-norm1); H, W multiples of ws.
      ln_scale, ln_bias: (C,) norm1 affine params.
      w_q: (C, Cq); b_q: (Cq,); w_kv: (C, 2Cq); b_kv: (2Cq,)  (classic's
        fused qkv Dense is passed as the two slices of its kernel/bias;
        Cq == C normally, Cq == C/P for a head-parallel TP worker's
        head-group slice — parallel/tp_attention.py).
      w_proj: (Cq, C); b_proj: (C,).
      bias: (heads, ws^2, ow^2) f32 — `heads` matches the slice.
      residual_scale: weight on the `+ x` shortcut (1/P for TP workers so
        the psum over partials reassembles exactly one residual).
    Returns:
      (B, H, W, C) = residual_scale*x + proj(attention(...)).
    """
    b, h_img, w_img, c = x_img.shape
    cq = w_q.shape[1]
    ws, ow = window_size, overlap_win
    d = cq // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = (ow - ws) // 2
    x_pad = jnp.pad(x_img, ((0, 0), (p, p), (p, p), (0, 0)))
    nwy, nwx = h_img // ws, w_img // ws
    grid = (b, nwy, nwx)
    args2d = [ln_scale.reshape(1, c), ln_bias.reshape(1, c),
              w_q, b_q.reshape(1, cq), w_kv, b_kv.reshape(1, 2 * cq),
              w_proj, b_proj.reshape(1, c)]
    const = lambda bb, i, j: (0, 0)
    out = pl.pallas_call(
        functools.partial(_ocab_block_kernel, heads=heads, ws=ws, ow=ow,
                          scale=scale, h_img=h_img, w_img=w_img,
                          ln_eps=ln_eps, residual_scale=residual_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, ws, c), lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(ow), pl.Element(ow),
                          pl.Element(c)),
                         lambda bb, i, j, _ws=ws: (bb, i * _ws, j * _ws, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * cq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * cq), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cq, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, ws * ws, ow * ow),
                         lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, c),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), x_img.dtype),
        interpret=interpret,
    )(x_img, x_pad, *args2d, bias)
    return out


def ocab_block_reference(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                         w_proj, b_proj, bias, heads: int, window_size: int,
                         overlap_win: int, scale: float | None = None,
                         ln_eps: float = 1e-5, residual_scale: float = 1.0):
    """XLA oracle/backward for fused_ocab_block (head-group weight slices
    and residual_scale generalize exactly as in the kernel)."""
    xt = x_img.astype(jnp.float32)
    mu = jnp.mean(xt, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xt - mu), axis=-1, keepdims=True)
    xn = ((xt - mu) * jax.lax.rsqrt(var + ln_eps)
          * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    xn = xn.astype(x_img.dtype)
    q = xn @ w_q.astype(xn.dtype) + b_q.astype(xn.dtype)
    kv = xn @ w_kv.astype(xn.dtype) + b_kv.astype(xn.dtype)
    out = ocab_attention_reference(q, kv, bias, heads, window_size,
                                   overlap_win, scale)
    res = x_img if residual_scale == 1.0 else x_img * residual_scale
    return (out @ w_proj.astype(out.dtype) + b_proj.astype(out.dtype)
            + res)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_ocab_block_ad(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                        w_proj, b_proj, bias, heads, window_size,
                        overlap_win, scale):
    """Fused OCAB block forward, XLA backward."""
    return fused_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                            w_proj, b_proj, bias, heads=heads,
                            window_size=window_size,
                            overlap_win=overlap_win, scale=scale)


def _ocab_block_ad_fwd(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                       w_proj, b_proj, bias, heads, window_size,
                       overlap_win, scale):
    out = fused_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                           w_proj, b_proj, bias, heads=heads,
                           window_size=window_size,
                           overlap_win=overlap_win, scale=scale)
    return out, (x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv, w_proj,
                 b_proj, bias)


def _ocab_block_ad_bwd(heads, window_size, overlap_win, scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: ocab_block_reference(*a, heads, window_size,
                                        overlap_win, scale), *res)
    return vjp(g.astype(res[0].dtype))


fused_ocab_block_ad.defvjp(_ocab_block_ad_fwd, _ocab_block_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def fused_ocab_block_scaled_ad(x_img, ln_scale, ln_bias, w_q, b_q, w_kv,
                               b_kv, w_proj, b_proj, bias, heads,
                               window_size, overlap_win, scale,
                               residual_scale):
    """fused_ocab_block with a residual_scale — the head-parallel TP
    worker's entry (parallel/tp_attention.py): head-group weight slices,
    residual/P, psum reassembles. Fused forward, XLA backward."""
    return fused_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                            w_proj, b_proj, bias, heads=heads,
                            window_size=window_size,
                            overlap_win=overlap_win, scale=scale,
                            residual_scale=residual_scale)


def _ocab_scaled_fwd(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                     w_proj, b_proj, bias, heads, window_size, overlap_win,
                     scale, residual_scale):
    out = fused_ocab_block(x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv,
                           w_proj, b_proj, bias, heads=heads,
                           window_size=window_size,
                           overlap_win=overlap_win, scale=scale,
                           residual_scale=residual_scale)
    return out, (x_img, ln_scale, ln_bias, w_q, b_q, w_kv, b_kv, w_proj,
                 b_proj, bias)


def _ocab_scaled_bwd(heads, window_size, overlap_win, scale, residual_scale,
                     res, g):
    _, vjp = jax.vjp(
        lambda *a: ocab_block_reference(*a, heads, window_size, overlap_win,
                                        scale, 1e-5, residual_scale), *res)
    return vjp(g.astype(res[0].dtype))


fused_ocab_block_scaled_ad.defvjp(_ocab_scaled_fwd, _ocab_scaled_bwd)


def _msa_block_core(xblk, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                    bias_ref, mask_ref, out_dtype, *, heads: int, ws: int,
                    scale: float, wb: int):
    """Shared VMEM body of the fused MSA block kernels: qkv projection,
    per-window attention with RPB (+mask), output projection. xblk is the
    (ws, wb*ws, c_in) window block (already gathered/assembled)."""
    c_in = xblk.shape[-1]
    c_loc = wqkv_ref.shape[-1] // 3
    c_out = wproj_ref.shape[-1]
    d = c_loc // heads
    n = ws * ws
    # wb adjacent windows per program: the qkv/proj matmuls run once over
    # all wb windows (M = wb*N rows feeds the MXU better than N=256), the
    # attention middle loops per window
    x = xblk.reshape(wb * n, c_in)
    # qkv projection on the MXU, f32 accumulate, bf16 operands
    qkv = jax.lax.dot_general(
        x, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(x.dtype)
    qkv_img = qkv.reshape(ws, wb * ws, 3 * c_loc)
    o_cols = []
    for w_i in range(wb):
        xw = qkv_img[:, w_i * ws:(w_i + 1) * ws].reshape(n, 3 * c_loc)
        m = mask_ref[w_i].astype(jnp.float32)
        outs = []
        for h in range(heads):
            q = xw[:, h * d:(h + 1) * d]
            k = xw[:, c_loc + h * d:c_loc + (h + 1) * d]
            v = xw[:, 2 * c_loc + h * d:2 * c_loc + (h + 1) * d]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[h].astype(jnp.float32) + m
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(x.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_cols.append(jnp.concatenate(outs, axis=-1)
                      .astype(x.dtype).reshape(ws, ws, c_loc))
    o = (o_cols[0] if wb == 1
         else jnp.concatenate(o_cols, axis=1)).reshape(wb * n, c_loc)
    o = jax.lax.dot_general(
        o, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + bproj_ref[0].astype(jnp.float32)
    return o.reshape(ws, wb * ws, c_out).astype(out_dtype)


def _msa_block_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                      bias_ref, mask_ref, o_ref, *, heads: int, ws: int,
                      scale: float, wb: int):
    # c_loc < c_in when the caller runs a head slice (tensor-parallel
    # attention, parallel/tp_attention.py): w_qkv is (c_in, 3*c_loc) with
    # `heads` local heads, w_proj (c_loc, c_out) a row-parallel partial
    o_ref[0] = _msa_block_core(
        x_ref[0], wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
        mask_ref, o_ref.dtype, heads=heads, ws=ws, scale=scale, wb=wb)


def _msa_block_shifted_kernel(x_ref, sh_ref, sw_ref, wqkv_ref, bqkv_ref,
                              wproj_ref, bproj_ref, bias_ref, mask_ref,
                              o_ref, *, heads: int, ws: int, scale: float,
                              wb: int, ss: int, nwy: int, nwxb: int):
    """Shift-folded variant: the cyclic (-ss, -ss) roll happens in the
    gather. The main read arrives at element origin (i*ws+ss, j*wb*ws+ss)
    (clamped in-bounds); the two thin wrap strips supply the cyclic
    content for the last window row / column, assembled in VMEM."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    xb = x_ref[0]                        # (ws, wb*ws, c) clamped main read
    sh = sh_ref[0]                       # (ws, wb*ws, c) bottom wrap strip
    sw = sw_ref[0]                       # (ws, 2*ss, c)  right wrap rows
    # last column block: clamped origin is ss left of the true one — the
    # first wb*ws-ss cols sit at xb[:, ss:], the wrapped tail (image cols
    # [0, ss)) lives in the strip's second half
    wrap_j = jnp.concatenate([xb[:, ss:], sw[:, ss:]], axis=1)
    blk = jnp.where(j == nwxb - 1, wrap_j, xb)
    # last row block: the strip is pre-assembled with both wraps applied
    blk = jnp.where(i == nwy - 1, sh, blk)
    o_ref[0] = _msa_block_core(
        blk, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
        mask_ref, o_ref.dtype, heads=heads, ws=ws, scale=scale, wb=wb)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "scale", "window_block",
                                             "interpret"))
def fused_msa_block(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask, *,
                    heads: int, window_size: int,
                    scale: float | None = None, window_block: int = 0,
                    interpret: bool | None = None):
    """(S)W-MSA middle INCLUDING the qkv and output projections.

    fused_msa_attention still consumed a materialized (B,H,W,3C) qkv image
    from HBM and wrote (B,H,W,C) back before the proj matmul — 4C of HBM
    round-trip per block (the round-2 verdict's top MFU lever). Here the
    kernel reads the (already shifted) C-channel image once, computes
    qkv = x @ W_qkv + b in VMEM, runs windowed attention with RPB (+shift
    mask), applies the output projection, and writes only the C-channel
    result. The projection weights have constant index maps, so Mosaic
    hoists their DMA out of the window grid.

    Args:
      x_img: (B, H, W, C) normed (and pre-shifted) image; H, W multiples
        of window_size.
      w_qkv: (C, 3C); b_qkv: (3C,).
      w_proj: (C, C); b_proj: (C,).
      bias: (heads, N, N) f32 RPB, N = ws^2.
      mask: (nW, N, N) f32 shift mask or (1, N, N) zeros.
    Returns:
      (B, H, W, C) = window_reverse(proj(attn(qkv(windows)))).
    """
    b, h_img, w_img, c = x_img.shape
    ws = window_size
    # c_loc/c_out differ from c when running a head slice (tensor-parallel
    # attention, parallel/tp_attention.py): w_qkv (c, 3*c_loc) projects
    # onto `heads` local heads and w_proj (c_loc, c_out) is row-parallel
    c_loc = w_qkv.shape[1] // 3
    c_out = w_proj.shape[1]
    d = c_loc // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nwy, nwx = h_img // ws, w_img // ws
    n = ws * ws
    masked = mask.shape[0] != 1
    # wb adjacent windows per program (amortizes the qkv/proj matmuls);
    # 0 = default from SR_MSA_WB, read once at import (an in-trace read
    # would be silently baked into the first compiled program)
    wb = window_block if window_block else _DEFAULT_MSA_WB
    while wb > 1 and nwx % wb:
        wb -= 1
    b_qkv2 = b_qkv.reshape(1, 3 * c_loc)
    b_proj2 = b_proj.reshape(1, c_out)
    mask_blk = mask if masked else jnp.zeros((wb, n, n), jnp.float32)
    grid = (b, nwy, nwx // wb)
    out = pl.pallas_call(
        functools.partial(_msa_block_kernel, heads=heads, ws=ws,
                          scale=scale, wb=wb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, wb * ws, c),
                         lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c_loc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c_loc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_loc, c_out), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, n),
                         (lambda bb, i, j, _x=nwx, _w=wb:
                          (i * (_x // _w) + j, 0, 0))
                         if masked else (lambda bb, i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wb * ws, c_out),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c_out),
                                       x_img.dtype),
        interpret=interpret,
    )(x_img, w_qkv, b_qkv2, w_proj, b_proj2, bias, mask_blk)
    return out


def msa_block_reference(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask,
                        heads: int, window_size: int,
                        scale: float | None = None):
    """XLA oracle/backward for fused_msa_block."""
    qkv_img = x_img @ w_qkv.astype(x_img.dtype) + b_qkv.astype(x_img.dtype)
    out = msa_attention_reference(qkv_img, bias, mask, heads, window_size,
                                  scale)
    return out @ w_proj.astype(out.dtype) + b_proj.astype(out.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "shift", "scale",
                                             "window_block", "interpret"))
def fused_msa_block_shifted(x_img, w_qkv, b_qkv, w_proj, b_proj, bias,
                            mask, *, heads: int, window_size: int,
                            shift: int, scale: float | None = None,
                            window_block: int = 0,
                            interpret: bool | None = None):
    """fused_msa_block with the SW-MSA cyclic pre-shift folded into the
    window gather: numerically identical to
    ``fused_msa_block(jnp.roll(x_img, (-shift, -shift), (1, 2)), ...)``
    (output stays in ROLLED space; the caller's +shift roll-back and the
    rolled-space shift mask are unchanged).

    Why: the full-image roll is two HBM round trips of the whole feature
    map per shifted block and measured 9.5% of the HD step (178 ms/step
    across 18 shifted blocks at 8x720x224x180 — r5 xplane trace,
    scripts/profile_hd_trace.py; jnp.roll lowers to slice+concat that
    runs far below copy bandwidth at C=180). Here the kernel reads the
    UNSHIFTED image at element origins (i*ws+shift, j*wb*ws+shift) —
    interior windows need no data movement at all — and the two cyclic
    boundary window rows/cols assemble from thin wrap strips
    (~ws/H of the image to build) in VMEM. The kernel is compute-bound
    (~21 TFLOP/s effective on the qkv/attn/proj matmuls), so the extra
    strip DMA per program is noise.

    Replaces: torch.roll in the reference's SW-MSA
    (swinir_arch.py:95-192 pattern; fork hat_arch.py HAB shift) — the
    roll-in leg only.
    """
    b, h_img, w_img, c = x_img.shape
    ws, ss = window_size, shift
    assert 0 < ss < ws and ws % ss == 0, (ss, ws)
    c_loc = w_qkv.shape[1] // 3
    c_out = w_proj.shape[1]
    d = c_loc // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nwy, nwx = h_img // ws, w_img // ws
    n = ws * ws
    masked = mask.shape[0] != 1
    wb = window_block if window_block else _DEFAULT_MSA_WB
    while wb > 1 and nwx % wb:
        wb -= 1
    nwxb = nwx // wb
    b_qkv2 = b_qkv.reshape(1, 3 * c_loc)
    b_proj2 = b_proj.reshape(1, c_out)
    mask_blk = mask if masked else jnp.zeros((wb, n, n), jnp.float32)

    # bottom wrap strip: the last shifted window row covers image rows
    # [H-ws+ss, H) ++ [0, ss); extend its columns by ss so every column
    # origin reads in-bounds (both wraps pre-applied)
    strip_h = jnp.concatenate([x_img[:, h_img - ws + ss:], x_img[:, :ss]],
                              axis=1)
    strip_h = jnp.concatenate([strip_h, strip_h[:, :, :ss]], axis=2)
    # right wrap strip rows: image cols [W-ss, W) ++ [0, ss) at every row
    strip_w = jnp.concatenate([x_img[:, :, w_img - ss:], x_img[:, :, :ss]],
                              axis=2)

    grid = (b, nwy, nwxb)
    # every candidate origin is a multiple of ss; factoring the min as
    # ss * min(...) keeps the tiling-divisibility proof structural for
    # Mosaic (a bare jnp.minimum over the sum is rejected: "couldn't
    # prove that tiling divides index")
    assert (h_img - ws) % ss == 0 and (w_img - wb * ws) % ss == 0
    row0 = lambda i, _q=ws // ss, _m=(h_img - ws) // ss: (  # noqa: E731
        ss * jnp.minimum(i * _q + 1, _m))
    col0 = lambda j, _q=wb * ws // ss, _m=(w_img - wb * ws) // ss: (  # noqa: E731
        ss * jnp.minimum(j * _q + 1, _m))
    out = pl.pallas_call(
        functools.partial(_msa_block_shifted_kernel, heads=heads, ws=ws,
                          scale=scale, wb=wb, ss=ss, nwy=nwy, nwxb=nwxb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(ws),
                          pl.Element(wb * ws), pl.Element(c)),
                         lambda bb, i, j: (bb, row0(i), col0(j), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(ws),
                          pl.Element(wb * ws), pl.Element(c)),
                         lambda bb, i, j, _q=wb * ws // ss: (
                             bb, 0, ss * (j * _q + 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(ws),
                          pl.Element(2 * ss), pl.Element(c)),
                         lambda bb, i, j: (bb, row0(i), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c_loc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c_loc), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_loc, c_out), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, n), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, n),
                         (lambda bb, i, j, _x=nwx, _w=wb:
                          (i * (_x // _w) + j, 0, 0))
                         if masked else (lambda bb, i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, wb * ws, c_out),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c_out),
                                       x_img.dtype),
        interpret=interpret,
    )(x_img, strip_h, strip_w, w_qkv, b_qkv2, w_proj, b_proj2, bias,
      mask_blk)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_msa_block_shifted_ad(x_img, w_qkv, b_qkv, w_proj, b_proj, bias,
                               mask, heads, window_size, shift, scale):
    """Shift-folded fused MSA block forward, XLA backward (the backward
    differentiates the roll + reference composition, so the cotangent of
    the un-rolled input comes out of jnp.roll's own transpose)."""
    return fused_msa_block_shifted(
        x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask, heads=heads,
        window_size=window_size, shift=shift, scale=scale)


def _msa_block_shifted_ad_fwd(x_img, w_qkv, b_qkv, w_proj, b_proj, bias,
                              mask, heads, window_size, shift, scale):
    out = fused_msa_block_shifted(
        x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask, heads=heads,
        window_size=window_size, shift=shift, scale=scale)
    return out, (x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask)


def _msa_block_shifted_ad_bwd(heads, window_size, shift, scale, res, g):
    x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b_, c_, d_, e_, f_, m_: msa_block_reference(
            jnp.roll(a, (-shift, -shift), axis=(1, 2)), b_, c_, d_, e_,
            f_, m_, heads, window_size, scale),
        x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask)
    return vjp(g.astype(x_img.dtype))


fused_msa_block_shifted_ad.defvjp(_msa_block_shifted_ad_fwd,
                                  _msa_block_shifted_ad_bwd)


def attention_window_supported(nq: int, nk: int | None = None) -> bool:
    """Scoped-VMEM bound for the attention-only window kernels
    (fused_attention / window_attention_fused): the per-window f32
    score/softmax pair plus the bias block must fit Mosaic's ~16 MB
    stack. Measured (scripts/bench_esc.py ESC_XL=1): ws 32 (N=1024)
    fits even in f32 (~12.6 MB); ws 48 (N=2304) needs 40.5 MB and
    fails AOT compile."""
    nk = nq if nk is None else nk
    return 12 * nq * nk <= 14 * 2 ** 20


def msa_block_supported(window_size: int, dtype) -> bool:
    """Scoped-VMEM bound for the fused MSA block route (interpret mode
    enforces no limit; on-chip the Mosaic stack is ~16 MB/core).

    Measured boundaries (scripts/bench_arb.py found the f32 one: LIIF's
    ESC trunk at ws 32 / C 64 in f32 fails AOT compile with "scoped
    allocation 18.00M > 16.00M"; the same shape in bf16 — the production
    precision policy — compiles and wins the A/B in bench_esc.py):
      - ws >= 48: the per-head f32 score/softmax pair alone is
        2*(48^2)^2*4 = 42 MB — always falls back (ESC-XL's native ws);
      - ws >= 32 in f32: measured 18 MB > 16 MB — falls back;
      - everything else (ws <= 32 bf16, ws <= 16 any dtype) fits.
    """
    if window_size >= 48:
        return False
    import jax.numpy as _jnp

    return not (window_size >= 32 and _jnp.dtype(dtype).itemsize >= 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_msa_block_ad(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask,
                       heads, window_size, scale):
    """Fused MSA block forward, XLA backward."""
    return fused_msa_block(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask,
                           heads=heads, window_size=window_size, scale=scale)


def _msa_block_ad_fwd(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask,
                      heads, window_size, scale):
    out = fused_msa_block(x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask,
                          heads=heads, window_size=window_size, scale=scale)
    return out, (x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask)


def _msa_block_ad_bwd(heads, window_size, scale, res, g):
    x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b_, c_, d_, e_, f_, m_: msa_block_reference(
            a, b_, c_, d_, e_, f_, m_, heads, window_size, scale),
        x_img, w_qkv, b_qkv, w_proj, b_proj, bias, mask)
    return vjp(g.astype(x_img.dtype))


fused_msa_block_ad.defvjp(_msa_block_ad_fwd, _msa_block_ad_bwd)


def _psa_block_kernel(x_ref, wq_ref, bq_ref, wproj_ref, bproj_ref, kv_ref,
                      bias_ref, mask_ref, o_ref, *, heads: int, ws: int,
                      scale: float):
    c = x_ref.shape[-1]
    d = c // heads
    n = ws * ws
    x = x_ref[0].reshape(n, c)
    # q projection on the MXU (bf16 operands, f32 accumulate)
    q = jax.lax.dot_general(
        x, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    q = (q + bq_ref[0].astype(jnp.float32)).astype(x.dtype)
    kv = kv_ref[0]                                # (nk, 2c) permuted K|V
    m = mask_ref[0].astype(jnp.float32)           # (n, nk)
    outs = []
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = kv[:, h * d:(h + 1) * d]
        vh = kv[:, c + h * d:c + (h + 1) * d]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (n, nk)
        s = s * scale + bias_ref[h].astype(jnp.float32) + m
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(x.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)
    o = jax.lax.dot_general(
        o, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + bproj_ref[0].astype(jnp.float32)
    o_ref[0] = o.reshape(ws, ws, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "scale", "interpret"))
def fused_psa_block(x_img, w_q, b_q, w_proj, b_proj, kv_windows, bias,
                    mask, *, heads: int, window_size: int,
                    scale: float | None = None,
                    interpret: bool | None = None):
    """SRFormer permuted-self-attention middle INCLUDING the q and output
    projections (ref: SRFormer/.../srformer_arch.py:119-222 PSA).

    PSA attends ws^2 queries against a 4x-compressed KV set (each 2x2
    spatial neighborhood's c/4-channel slices fold into one token). The
    KV projection + permutation stay in XLA (the fold is a lane->sublane
    layout change Mosaic can't express; the compressed (nk, 2C) windows
    are 4x smaller than x so their HBM cost is minor). The kernel reads
    the normed/shifted C-channel image once per window, computes
    q = x @ W_q in VMEM, runs rectangular attention with the aligned RPB
    (+ optional shift mask), applies the output projection, and writes
    only the C-channel result — the q image and pre-proj attention output
    never touch HBM.

    Args:
      x_img: (B, H, W, C) normed (pre-shifted) image, H/W multiples of ws.
      w_q: (C, C); b_q: (C,). w_proj: (C, C); b_proj: (C,).
      kv_windows: (B*nW, nk, 2C) permuted compressed KV per window,
        nk = (ws/2)^2, channels = [K(C) | V(C)], K/V feature order = the
        flattened (2, 2, C/4) neighborhood fold (torch kv.reshape order).
      bias: (heads, N, nk) f32 aligned RPB, N = ws^2.
      mask: (nW, N, nk) f32 rectangular shift mask or (1, N, nk) zeros.
    Returns:
      (B, H, W, C) = window_reverse(proj(attn(q(windows), kv))).
    """
    b, h_img, w_img, c = x_img.shape
    ws = window_size
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nwy, nwx = h_img // ws, w_img // ws
    n = ws * ws
    nk = (ws // 2) ** 2
    masked = mask.shape[0] != 1
    b_q2 = b_q.reshape(1, c)
    b_proj2 = b_proj.reshape(1, c)
    grid = (b, nwy, nwx)
    out = pl.pallas_call(
        functools.partial(_psa_block_kernel, heads=heads, ws=ws,
                          scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, ws, c), lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, 2 * c),
                         (lambda bb, i, j, _ny=nwy, _nx=nwx:
                          (bb * _ny * _nx + i * _nx + j, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, nk), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, nk),
                         (lambda bb, i, j, _nx=nwx: (i * _nx + j, 0, 0))
                         if masked else (lambda bb, i, j: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, ws, c),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), x_img.dtype),
        interpret=interpret,
    )(x_img, w_q, b_q2, w_proj, b_proj2, kv_windows, bias, mask)
    return out


def psa_block_reference(x_img, w_q, b_q, w_proj, b_proj, kv_windows, bias,
                        mask, heads: int, window_size: int,
                        scale: float | None = None):
    """XLA oracle/backward for fused_psa_block."""
    from super_resolution_tpu.ops.attention import attention_with_bias
    from super_resolution_tpu.ops.windowing import (window_partition,
                                                    window_reverse)

    b, h_img, w_img, c = x_img.shape
    ws = window_size
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    n = ws * ws
    nk = kv_windows.shape[1]
    q_img = x_img @ w_q.astype(x_img.dtype) + b_q.astype(x_img.dtype)
    qw = window_partition(q_img, ws).reshape(-1, n, c)
    bw = qw.shape[0]
    qh = qw.reshape(bw, n, heads, d).transpose(0, 2, 1, 3)
    kh = kv_windows[..., :c].reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    vh = kv_windows[..., c:].reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    full_bias = bias[None]
    if mask.shape[0] != 1:
        nw = mask.shape[0]
        full_bias = bias[None, None] + mask[None, :, None]
        qh = qh.reshape(bw // nw, nw, heads, n, d)
        kh = kh.reshape(bw // nw, nw, heads, nk, d)
        vh = vh.reshape(bw // nw, nw, heads, nk, d)
        out = attention_with_bias(qh, kh, vh, full_bias, scale=scale)
        out = out.reshape(bw, heads, n, d)
    else:
        out = attention_with_bias(qh, kh, vh, full_bias + mask[:1, None],
                                  scale=scale)
    out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
    out = out @ w_proj.astype(out.dtype) + b_proj.astype(out.dtype)
    return window_reverse(out.reshape(-1, ws, ws, c), ws, h_img, w_img)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_psa_block_ad(x_img, w_q, b_q, w_proj, b_proj, kv_windows, bias,
                       mask, heads, window_size, scale):
    """Fused PSA block forward, XLA backward."""
    return fused_psa_block(x_img, w_q, b_q, w_proj, b_proj, kv_windows,
                           bias, mask, heads=heads, window_size=window_size,
                           scale=scale)


def _psa_block_ad_fwd(x_img, w_q, b_q, w_proj, b_proj, kv_windows, bias,
                      mask, heads, window_size, scale):
    out = fused_psa_block(x_img, w_q, b_q, w_proj, b_proj, kv_windows,
                          bias, mask, heads=heads, window_size=window_size,
                          scale=scale)
    return out, (x_img, w_q, b_q, w_proj, b_proj, kv_windows, bias, mask)


def _psa_block_ad_bwd(heads, window_size, scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: psa_block_reference(*a, heads, window_size, scale), *res)
    return vjp(g.astype(res[0].dtype))


fused_psa_block_ad.defvjp(_psa_block_ad_fwd, _psa_block_ad_bwd)


def window_attention_fused(qkv_windows, num_heads: int, bias,
                           scale: float | None = None):
    """Drop-in for ops.attention.window_msa: qkv (3, BW, N, C) ->
    (BW, N, C)."""
    _, bw, n, c = qkv_windows.shape
    d = c // num_heads
    qkv = qkv_windows.reshape(3, bw, n, num_heads, d).transpose(0, 1, 3, 2, 4)
    out = fused_attention(qkv[0], qkv[1], qkv[2], bias, scale=scale)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)


# --------------------------------------------------------------------------
# HiT-SRF spatial-channel correlation (SCC) block megakernel
# --------------------------------------------------------------------------

def _scc_base_projection(wh, ww, bh, bw, sl_w, sl_b):
    """Base-grid projection as a dense matrix P (baseL, L): each base
    cell's (wh/bh x ww/bw) sub-grid collapses through the shared
    spatial_linear weights, so vs = P @ v + b replaces the reference's
    7-D reshape/transpose chain (ref: hitsrf_arch.py:232-247
    spatial_linear) with one MXU matmul.

    sl_w: (ratio,) spatial_linear kernel; sl_b: scalar bias.
    Returns (P, sl_b) with P in sl_w's dtype.
    """
    import numpy as np

    sh, sw = wh // bh, ww // bw
    L = wh * ww
    i, j = np.arange(L) // ww, np.arange(L) % ww
    m = (i // sh) * bw + (j // sw)            # base cell of each token
    r = (i % sh) * sw + (j % sw)              # sub-position inside cell
    onehot = np.zeros((bh * bw, L), np.float32)
    onehot[m, np.arange(L)] = 1.0
    P = jnp.asarray(onehot) * sl_w[jnp.asarray(r)][None, :].astype(jnp.float32)
    return P.astype(sl_w.dtype), sl_b


def scc_block_supported(wh: int, ww: int, w_img: int, c: int,
                        heads: int, base_l: int = 64) -> bool:
    """On-chip constraints for the fused SCC route (both caught by
    scripts/bench_hitsrf.py on real hardware; interpret mode enforces
    neither):
    - Mosaic requires the block's sublane dim (the window width) to be
      divisible by 8 or equal to the full array dim — HiT-SRF's ratio-0.5
      block (4x4 windows) falls back to XLA;
    - scoped VMEM is ~16 MB/core: the f32 bias (heads, L, baseL) plus the
      per-head correlation intermediates of a 64x64 window (L=4096) need
      ~21.6 MB, so the largest hierarchical window falls back too.
    """
    L = wh * ww
    est = heads * L * base_l * 4 + 8 * L * c * 4
    return (ww % 8 == 0 or ww == w_img) and est < 12 * 2 ** 20


def _rect_win_partition(x, wh, ww):
    b, h, w, c = x.shape
    x = x.reshape(b, h // wh, wh, w // ww, ww, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, wh * ww, c)


def _rect_win_reverse(wins, wh, ww, h, w):
    b = wins.shape[0] // (h // wh * (w // ww))
    x = wins.reshape(b, h // wh, w // ww, wh, ww, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _scc_block_kernel(qv_ref, p_ref, slb_ref, wproj_ref, bproj_ref,
                      bias_ref, o_ref, *, heads: int, wh: int, ww: int):
    c = qv_ref.shape[-1]
    c2 = c // 2
    d = c2 // heads
    L = wh * ww
    x = qv_ref[0].reshape(L, c)
    q = x[:, :c2]
    v = x[:, c2:]

    # base projection: vs = P @ v + sl_b  (baseL, c2), f32 accumulate
    vs = jax.lax.dot_general(
        p_ref[:], v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # (1,1) block broadcast-added as a vector — a scalar extract of a
    # non-32-bit ref is unsupported by Mosaic
    vs = (vs + slb_ref[...].astype(jnp.float32)).astype(x.dtype)

    # spatial self-correlation per head: q @ vs^T / d (NO softmax — SCC is
    # a linear correlation, ref: hitsrf_arch.py:249-258), + dynamic bias
    outs = []
    inv_d = 1.0 / float(d)
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        vsh = vs[:, h * d:(h + 1) * d]
        corr = jax.lax.dot_general(
            qh, vsh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        corr = corr * inv_d + bias_ref[h].astype(jnp.float32)
        outs.append(jax.lax.dot_general(
            corr.astype(x.dtype), vsh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    x_spatial = jnp.concatenate(outs, axis=-1).astype(x.dtype)   # (L, c2)

    # channel self-correlation (single head): (c2, c2) Gram over tokens
    corr_c = jax.lax.dot_general(
        q, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / float(L))
    x_channel = jax.lax.dot_general(
        v, corr_c.astype(x.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)      # (L, c2)

    o = jnp.concatenate([x_spatial, x_channel], axis=-1)
    o = jax.lax.dot_general(
        o, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o + bproj_ref[0].astype(jnp.float32)
    o_ref[0] = o.reshape(wh, ww, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "base",
                                             "interpret"))
def fused_scc_block(qv_img, sl_w, sl_b, w_proj, b_proj, bias, *, heads: int,
                    window_size: tuple, base: tuple,
                    interpret: bool | None = None):
    """HiT-SRF SCC middle INCLUDING the base projection and output proj.

    The XLA path materializes per-window q/v tensors, a 7-D
    reshape/transpose chain for the base-grid value projection, two
    correlation einsums per branch and two window reverses — ~8 HBM round
    trips of C-channel images for a dim-60 model that is entirely
    bandwidth-bound. This kernel reads the DFE-projected qv image once per
    window, computes the base projection (as one dense P @ v matmul),
    both correlations (spatial per-head with the DynamicPosBias bias,
    channel Gram), the concat and the output projection in VMEM, and
    writes only the C-channel result (ref: hat/archs/hitsrf_arch.py:175-320).

    Args:
      qv_img: (B, H, W, C) DFE output; channels = [q (C/2) | v (C/2)],
        head h = contiguous d-slice. H % wh == 0, W % ww == 0.
      sl_w: (ratio,) spatial_linear kernel column; sl_b: () its bias.
      w_proj: (C, C); b_proj: (C,).
      bias: (heads, L, baseL) f32 dynamic position bias (SCC._spatial_bias).
    Returns:
      (B, H, W, C) projected correlation output.
    """
    b, h_img, w_img, c = qv_img.shape
    wh, ww = window_size
    bh, bw = base
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = wh * ww
    bl = bh * bw
    P, _ = _scc_base_projection(wh, ww, bh, bw, sl_w, sl_b)
    # pre-broadcast the scalar bias along lanes: in-kernel it only needs
    # the (supported) sublane broadcast (Mosaic has no 2-axis broadcast,
    # and no non-32-bit scalar extract)
    slb2 = jnp.broadcast_to(sl_b.reshape(1, 1), (1, c // 2))
    bproj2 = b_proj.reshape(1, c)
    grid = (b, h_img // wh, w_img // ww)
    return pl.pallas_call(
        functools.partial(_scc_block_kernel, heads=heads, wh=wh, ww=ww),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wh, ww, c), lambda bb, i, j: (bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bl, L), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c // 2), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bb, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, L, bl), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wh, ww, c),
                               lambda bb, i, j: (bb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), qv_img.dtype),
        interpret=interpret,
    )(qv_img, P, slb2, w_proj, bproj2, bias)


def scc_block_reference(qv_img, sl_w, sl_b, w_proj, b_proj, bias,
                        heads: int, window_size: tuple, base: tuple):
    """XLA oracle/backward for fused_scc_block (same math as
    models/hitsrf_arch.py::SCC.__call__ after the qv projection)."""
    b, h_img, w_img, c = qv_img.shape
    wh, ww = window_size
    bh, bw = base
    c2 = c // 2
    d = c2 // heads
    L = wh * ww
    bl = bh * bw
    P, _ = _scc_base_projection(wh, ww, bh, bw, sl_w, sl_b)
    qvw = _rect_win_partition(qv_img, wh, ww)                # (BW, L, c)
    q, v = qvw[..., :c2], qvw[..., c2:]
    vs = jnp.einsum("ml,blc->bmc", P.astype(v.dtype), v) + sl_b.astype(v.dtype)
    bw_n = q.shape[0]
    qh = q.reshape(bw_n, L, heads, d).transpose(0, 2, 1, 3)
    vsh = vs.reshape(bw_n, bl, heads, d).transpose(0, 2, 1, 3)
    corr = jnp.einsum("bhld,bhmd->bhlm", qh, vsh) / float(d) \
        + bias[None].astype(qh.dtype)
    xs = jnp.einsum("bhlm,bhmd->bhld", corr, vsh)
    xs = xs.transpose(0, 2, 1, 3).reshape(bw_n, L, c2)
    corr_c = jnp.einsum("blc,bld->bcd", q, v) / float(L)
    xc = jnp.einsum("bcd,bld->blc", corr_c, v)
    out = jnp.concatenate([xs, xc], axis=-1)
    out = out @ w_proj.astype(out.dtype) + b_proj.astype(out.dtype)
    return _rect_win_reverse(out, wh, ww, h_img, w_img)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_scc_block_ad(qv_img, sl_w, sl_b, w_proj, b_proj, bias, heads,
                       window_size, base):
    """Fused SCC block forward, XLA backward."""
    return fused_scc_block(qv_img, sl_w, sl_b, w_proj, b_proj, bias,
                           heads=heads, window_size=window_size, base=base)


def _scc_block_ad_fwd(qv_img, sl_w, sl_b, w_proj, b_proj, bias, heads,
                      window_size, base):
    out = fused_scc_block(qv_img, sl_w, sl_b, w_proj, b_proj, bias,
                          heads=heads, window_size=window_size, base=base)
    return out, (qv_img, sl_w, sl_b, w_proj, b_proj, bias)


def _scc_block_ad_bwd(heads, window_size, base, res, g):
    _, vjp = jax.vjp(
        lambda *a: scc_block_reference(*a, heads, window_size, base), *res)
    return vjp(g.astype(res[0].dtype))


fused_scc_block_ad.defvjp(_scc_block_ad_fwd, _scc_block_ad_bwd)


# --------------------------------------------------------------------------
# Full unshifted-HAB megakernel: W-MSA + 3-way residual + MLP tail
# --------------------------------------------------------------------------

def _hab_block_kernel(lnx_ref, x_ref, cv_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, bias_ref, gam_ref, bet_ref, w1_ref, b1_ref,
                      w2_ref, b2_ref, o_ref, *, heads: int, ws: int,
                      scale: float, cs: float, eps: float):
    from super_resolution_tpu.ops.pallas_ffn import _mlp_tail_math

    c = lnx_ref.shape[-1]
    d = c // heads
    n = ws * ws
    lnx = lnx_ref[0].reshape(n, c)
    qkv = jax.lax.dot_general(
        lnx, wqkv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0].astype(jnp.float32)).astype(lnx.dtype)
    outs = []
    for h in range(heads):
        q = qkv[:, h * d:(h + 1) * d]
        k = qkv[:, c + h * d:c + (h + 1) * d]
        v = qkv[:, 2 * c + h * d:2 * c + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[h].astype(jnp.float32)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot_general(
            p.astype(lnx.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1).astype(lnx.dtype)
    attn = jax.lax.dot_general(
        attn, wproj_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    attn = attn + bproj_ref[0].astype(jnp.float32)
    # 3-way residual, then the LN2 + MLP + residual tail, all in f32
    xf = (x_ref[0].reshape(n, c).astype(jnp.float32) + attn
          + cv_ref[0].reshape(n, c).astype(jnp.float32) * cs)
    out = _mlp_tail_math(xf, lnx.dtype, gam_ref, bet_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, eps)
    o_ref[0] = out.reshape(ws, ws, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "window_size", "scale",
                                             "conv_scale", "eps",
                                             "interpret"))
def fused_hab_block(lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj, b_proj,
                    bias, gamma, beta, w1, b1, w2, b2, *, heads: int,
                    window_size: int, scale: float | None = None,
                    conv_scale: float = 0.01, eps: float = 1e-5,
                    interpret: bool | None = None):
    """The ENTIRE unshifted classic HAB after norm1/CAB in one kernel:

        attn = proj(W-MSA(qkv(ln_x)))          per ws-window, with RPB
        x    = shortcut + attn + conv_scale * conv_x
        out  = x + fc2(gelu(fc1(LN2(x))))

    (ref: swinir_arch.py:95-192 attention; hat structure per SURVEY §2.3.)
    vs the split MSA-megakernel + residual-fused-MLP pipeline this removes
    the attention output's HBM write + re-read (~0.93 GB per block at the
    bench band shape on a ~150 GB/s-effective chip). Shifted blocks keep
    the split path: their roll-back between attention and residual cannot
    cross a pallas_call boundary.

    Args:
      lnx_img: (B, H, W, C) norm1 output; x_img: the block input
        (shortcut); conv_img: CAB branch output (unscaled).
      w_qkv (C, 3C), w_proj (C, C), bias (heads, N, N) f32 RPB,
      gamma/beta: norm2 params; w1 (C, HID), w2 (HID, C).
    """
    b, h_img, w_img, c = lnx_img.shape
    ws = window_size
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = ws * ws
    hid = w1.shape[1]
    grid = (b, h_img // ws, w_img // ws)
    img = pl.BlockSpec((1, ws, ws, c), lambda bb, i, j: (bb, i, j, 0),
                       memory_space=pltpu.VMEM)
    cvec = lambda m: pl.BlockSpec((1, m), lambda bb, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)
    mat = lambda r, co: pl.BlockSpec((r, co), lambda bb, i, j: (0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hab_block_kernel, heads=heads, ws=ws, scale=scale,
                          cs=conv_scale, eps=eps),
        grid=grid,
        in_specs=[
            img, img, img,
            mat(c, 3 * c), cvec(3 * c), mat(c, c), cvec(c),
            pl.BlockSpec((heads, n, n), lambda bb, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            cvec(c), cvec(c), mat(c, hid), cvec(hid), mat(hid, c), cvec(c),
        ],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, h_img, w_img, c), lnx_img.dtype),
        interpret=interpret,
    )(lnx_img, x_img, conv_img, w_qkv, b_qkv.reshape(1, 3 * c), w_proj,
      b_proj.reshape(1, c), bias, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, hid), w2, b2.reshape(1, c))


def hab_block_reference(lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj,
                        b_proj, bias, gamma, beta, w1, b1, w2, b2,
                        heads: int, window_size: int,
                        scale: float | None = None, conv_scale: float = 0.01,
                        eps: float = 1e-5):
    """XLA oracle/backward for fused_hab_block."""
    from super_resolution_tpu.ops.pallas_ffn import (mlp_block_reference)

    mask = jnp.zeros((1, window_size ** 2, window_size ** 2), jnp.float32)
    attn = msa_block_reference(lnx_img, w_qkv, b_qkv, w_proj, b_proj, bias,
                               mask, heads, window_size, scale)
    x = (x_img.astype(jnp.float32) + attn.astype(jnp.float32)
         + conv_img.astype(jnp.float32) * conv_scale).astype(x_img.dtype)
    return mlp_block_reference(x, gamma, beta, w1, b1, w2, b2, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_hab_block_ad(lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj,
                       b_proj, bias, gamma, beta, w1, b1, w2, b2, heads,
                       window_size, scale, conv_scale):
    """Fused forward, XLA backward."""
    return fused_hab_block(lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj,
                           b_proj, bias, gamma, beta, w1, b1, w2, b2,
                           heads=heads, window_size=window_size, scale=scale,
                           conv_scale=conv_scale)


def _hab_block_ad_fwd(lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj, b_proj,
                      bias, gamma, beta, w1, b1, w2, b2, heads, window_size,
                      scale, conv_scale):
    args = (lnx_img, x_img, conv_img, w_qkv, b_qkv, w_proj, b_proj, bias,
            gamma, beta, w1, b1, w2, b2)
    out = fused_hab_block(*args, heads=heads, window_size=window_size,
                          scale=scale, conv_scale=conv_scale)
    return out, args


def _hab_block_ad_bwd(heads, window_size, scale, conv_scale, res, g):
    _, vjp = jax.vjp(
        lambda *a: hab_block_reference(*a, heads, window_size, scale,
                                       conv_scale), *res)
    return vjp(g.astype(res[0].dtype))


fused_hab_block_ad.defvjp(_hab_block_ad_fwd, _hab_block_ad_bwd)


# --------------------------------------------------------------------------
# Q-tiled window MSA for LARGE windows (ESC-XL's native ws 48, and any
# f32 shape the whole-window kernels can't hold).
#
# The whole-window kernels above keep the full (N, N) f32 score/softmax
# pair in VMEM, which dies at N = 48^2 = 2304 (2 * N^2 * 4 = 42 MB vs the
# ~16 MB Mosaic stack). But K and V for a whole window are tiny
# (N x d ~ 150 KB at ESC-XL's d = 16), so no flash-style online softmax
# is needed either: tile the QUERY dim instead. Each program owns Tq
# query rows of one (window, head), sees the full key range, and computes
# an exact row softmax — no accumulators, no multi-pass, no scratch.
# VMEM per program is 2 * 4 * Tq * N (score + bias slab) + O(N*d).
#
# Layout: q/k/v are pre-split per head OUTSIDE the kernel into
# (heads, B, H, W, d) so the kernel never slices the lane dim dynamically
# (d = C/heads is 16 at ESC-XL — a dynamic lane-offset slice would not
# lower). The two transposes cost one qkv-sized HBM round trip, ~2% of
# the bias traffic this kernel streams anyway.
#
# Replaces: the slabbed-XLA fallback for ESC-XL (ref dep:
# hat/archs/esc_arch.py:234-240 FlexAttention at window_size 48).
# --------------------------------------------------------------------------


def _msa_qtile_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    tq = q_ref.shape[2] * q_ref.shape[3]
    n = k_ref.shape[2] * k_ref.shape[3]
    d = q_ref.shape[-1]
    q = q_ref[0, 0].reshape(tq, d)
    k = k_ref[0, 0].reshape(n, d)
    v = v_ref[0, 0].reshape(n, d)
    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale + bias_ref[0].astype(jnp.float32)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(q.dtype), v,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.reshape(q_ref.shape[2], q_ref.shape[3], d).astype(
        o_ref.dtype)


def _qtile_rows(window_size: int, budget_bytes: int = 12 * 2 ** 20) -> int:
    """Largest per-program query-row count ts (ts | ws) such that the
    THREE f32 (ts*ws, ws^2) slabs (score, softmax, bias block) plus ~2 MB
    of q/k/v tiles fit the VMEM budget. Calibrated against a measured
    point: ws 48 / ts 12 allocates 17.87 M on v5e (Mosaic AOT), i.e.
    ~15.9 M of slabs + ~2 M fixed."""
    n = window_size * window_size
    best = 0
    for ts in range(1, window_size + 1):
        if window_size % ts:
            continue
        if 12 * (ts * window_size) * n + 2 * 2 ** 20 <= budget_bytes:
            best = ts
    return best


def msa_qtile_supported(window_size: int, dim: int, heads: int) -> bool:
    """True when the q-tiled kernel can run this shape: d = dim/heads must
    be a multiple of 8 (sublane-aligned head layout) and at least one
    query-row tiling must fit VMEM."""
    if dim % heads:
        return False
    d = dim // heads
    return d % 8 == 0 and _qtile_rows(window_size) >= 1


def qtile_route_enabled() -> bool:
    """Opt-in gate (SR_TPU_QTILE=1) — measured SLOWER than slabbed XLA
    on the target shape, kept as a negative result with its data.

    ESC-XL (240x288, ws 48, 12 heads, d=16, bf16, v5e): XLA 3.37
    out-Mpix/s; q-tile kernel 2.36 with windows outermost (the 255 MB
    f32 bias re-streams per window, 7.6 GB total), 2.49 with windows
    innermost (bias streamed once). The residual gap is MXU shape, not
    traffic: every head contraction is K=d=16 (<=12.5% MXU), and XLA's
    slab einsums run that starved matmul at M=2304 across batched
    windows while the kernel runs 2880 M<=576 programs per call. A
    kernel can't fix K; it only helps when layout traffic dominates,
    which at d=16 it does not."""
    import os

    return os.environ.get("SR_TPU_QTILE") == "1"


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "scale", "interpret"))
def msa_qtile_attention(qkv_img, bias, *, heads: int, window_size: int,
                        scale: float | None = None,
                        interpret: bool | None = None):
    """Unshifted window MSA on images with query-dim tiling.

    Args:
      qkv_img: (B, H, W, 3C); H, W multiples of window_size.
      bias: (heads, N, N) f32 relative position bias, N = ws^2.
    Returns:
      (B, H, W, C) attention output (pre out-projection), image layout.
    """
    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    ws = window_size
    d = c // heads
    n = ws * ws
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ts = _qtile_rows(ws)
    nq = ws // ts
    nwy, nwx = h_img // ws, w_img // ws

    # per-head planes: (heads, B, H, W, d)
    qkv = qkv_img.reshape(b, h_img, w_img, 3, heads, d)
    q_hd = qkv[:, :, :, 0].transpose(3, 0, 1, 2, 4)
    k_hd = qkv[:, :, :, 1].transpose(3, 0, 1, 2, 4)
    v_hd = qkv[:, :, :, 2].transpose(3, 0, 1, 2, 4)

    # Grid order matters: windows are INNERMOST so the (ts*ws, N) f32
    # bias tile — by far the largest stream, heads*N^2*4 = 255 MB at
    # ESC-XL scale — stays block-resident across every window and is
    # fetched exactly once overall. With windows outer / q-tiles inner
    # (the first attempt), the bias was re-streamed per window: 7.6 GB
    # of HBM traffic on a 240x288 ESC-XL input, and the kernel LOST to
    # XLA 2.36 vs 3.37 out-Mpix/s. K/V re-fetch per q-tile costs only
    # ~8 x the qkv plane (~0.4 GB) in exchange.
    grid = (b, heads, nq, nwy, nwx)
    out = pl.pallas_call(
        functools.partial(_msa_qtile_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ts, ws, d),
                         lambda bb, h, jq, i, j, _nq=nq:
                         (h, bb, i * _nq + jq, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ws, ws, d),
                         lambda bb, h, jq, i, j: (h, bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ws, ws, d),
                         lambda bb, h, jq, i, j: (h, bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts * ws, n),
                         lambda bb, h, jq, i, j: (h, jq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ts, ws, d),
                               lambda bb, h, jq, i, j, _nq=nq:
                               (h, bb, i * _nq + jq, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((heads, b, h_img, w_img, d),
                                       qkv_img.dtype),
        interpret=interpret,
    )(q_hd, k_hd, v_hd, bias)
    # (heads, B, H, W, d) -> (B, H, W, C)
    return out.transpose(1, 2, 3, 0, 4).reshape(b, h_img, w_img, c)


def msa_qtile_reference(qkv_img, bias, heads: int, window_size: int,
                        scale: float):
    """XLA oracle/backward: unshifted MSA == the generic kernel with a
    zero shift mask."""
    n = window_size * window_size
    mask = jnp.zeros((1, n, n), jnp.float32)
    return msa_attention_reference(qkv_img, bias, mask, heads, window_size,
                                   scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def msa_qtile_attention_ad(qkv_img, bias, heads, window_size, scale):
    """Q-tiled forward, XLA backward."""
    return msa_qtile_attention(qkv_img, bias, heads=heads,
                               window_size=window_size, scale=scale)


def _msa_qtile_ad_fwd(qkv_img, bias, heads, window_size, scale):
    out = msa_qtile_attention(qkv_img, bias, heads=heads,
                              window_size=window_size, scale=scale)
    return out, (qkv_img, bias)


def _msa_qtile_ad_bwd(heads, window_size, scale, res, g):
    qkv_img, bias = res
    _, vjp = jax.vjp(
        lambda a, b_: msa_qtile_reference(a, b_, heads, window_size, scale),
        qkv_img, bias)
    return vjp(g.astype(qkv_img.dtype))


msa_qtile_attention_ad.defvjp(_msa_qtile_ad_fwd, _msa_qtile_ad_bwd)


# --------------------------------------------------------------------------
# Flash-accumulator window MSA for LARGE windows — the r3-verdict follow-up
# experiment to the q-tiled kernel above (ask 8: "online-softmax
# accumulator with multiple windows batched per program to feed the MXU").
#
# Design vs the q-tile kernel's two measured failure modes:
#   1. bias streaming — grid order is (b, heads, window-ROW, kv-chunk,
#      window-COL) with the kv-chunk axis OUTSIDE the window sweep, so
#      the (N, Tk) f32 bias chunk is fetched once per (head, chunk) and
#      reused across every window of the row (the q-tile loser refetched
#      the full 21 MB/head bias per window: 7.6 GB on ESC-XL);
#   2. MXU feeding — each program computes a FULL window of M = N = ws^2
#      query rows (2304 at ws 48, 4x the q-tile kernel's 576), and the
#      PV contraction runs at K = Tk (288) instead of the q-tile
#      kernel's d = 16.
# The price is flash bookkeeping: per-window f32 accumulators (o, m, l)
# for ALL windows of the current row persist in scratch across the chunk
# sweep, and the output block is rewritten with the running normalized
# estimate at every chunk (the final chunk's write wins).
#
# LAYOUT (the first attempt OOM'd at 20.25M scoped VMEM): every VMEM
# buffer pads its lane (last) dim to 128, so natural (N, d=16) / (N, 1)
# accumulators cost 8x their payload (7.1 MB each at ESC-XL). The whole
# computation therefore runs TRANSPOSED — lanes carry N (2304, full),
# sublanes carry Tk/d: scores are (Tk, N) = k @ q^T, the running max and
# denominator are (1, N) sublane reductions, the accumulator is (d, N)
# = v^T @ p, and the output ships in per-window (d, N) layout that XLA
# untransposes outside the kernel. Bonus: both matmuls contract over the
# MXU-native axis (QK^T over d with N output lanes, PV over Tk).
# --------------------------------------------------------------------------


def _msa_flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                      acc_ref, m_ref, l_ref, *, scale: float):
    ch = pl.program_id(3)
    g = pl.program_id(4)
    n = q_ref.shape[2] * q_ref.shape[3]
    tk = k_ref.shape[2] * k_ref.shape[3]
    d = q_ref.shape[-1]
    q = q_ref[0, 0].reshape(n, d)
    k = k_ref[0, 0].reshape(tk, d)
    v = v_ref[0, 0].reshape(tk, d)

    @pl.when(ch == 0)
    def _init():
        acc_ref[g] = jnp.zeros_like(acc_ref[g])
        m_ref[g] = jnp.full_like(m_ref[g], -jnp.inf)
        l_ref[g] = jnp.zeros_like(l_ref[g])

    s = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (Tk, N) f32
    s = s * scale + bias_ref[0].astype(jnp.float32)
    m_prev = m_ref[g]                                        # (1, N)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)                                   # (Tk, N)
    l_new = l_ref[g] * alpha + jnp.sum(p, axis=0, keepdims=True)
    pv = jax.lax.dot_general(
        v, p.astype(v.dtype), dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # (d, N) f32
    a_new = acc_ref[g] * alpha + pv
    acc_ref[g] = a_new
    m_ref[g] = m_cur
    l_ref[g] = l_new
    o_ref[0, 0, 0] = (a_new / l_new).astype(o_ref.dtype)     # (d, N)


def _flash_chunk_rows(window_size: int, budget_bytes: int = 13 * 2 ** 20):
    """KV-chunk row count cr (cr | ws) so the f32 (N, cr*ws) score,
    softmax and bias slabs fit scoped VMEM alongside the accumulators.
    Mosaic requires the bias block's lane dim to be a multiple of 128
    (or the whole N), so cr*ws must be too — at ws 48 that means cr=8
    (Tk=384, ~11.8M slabs)."""
    n = window_size * window_size
    best = 0
    for cr in range(1, window_size + 1):
        if window_size % cr:
            continue
        tk = cr * window_size
        if tk % 128 and tk != n:
            continue
        if 12 * n * tk + 2 * 2 ** 20 <= budget_bytes:
            best = cr
    return best


def msa_flash_supported(window_size: int, dim: int, heads: int,
                        nwx: int = 8) -> bool:
    """nwx: window columns — the per-row accumulator scratch is
    nwx * (d + 2) * N * 4 bytes and must fit beside the score slabs
    (ESC-XL at 288 px wide: 6 * 18 * 2304 * 4 = 1.0 MB; a 4K-wide input
    would need 13 MB and must fall back)."""
    if dim % heads:
        return False
    d = dim // heads
    cr = _flash_chunk_rows(window_size)
    if d % 8 or cr < 1:
        return False
    n = window_size * window_size
    scratch = nwx * (d + 2) * n * 4
    slabs = 12 * n * cr * window_size
    return scratch + slabs + 2 * 2 ** 20 <= 15 * 2 ** 20


def flash_route_enabled() -> bool:
    """Opt-in gate (SR_TPU_FLASH=1) — measured on v5e (ESC-XL, 240x288,
    ws 48, 12 heads, d=16, bf16): XLA 3.378 / q-tile 2.496 / flash 2.510
    out-Mpix/s. The flash design removed BOTH of the q-tile kernel's
    suspected costs — the bias streams once per (head, chunk) across a
    window row, and the PV contraction runs at K=384 — and the number
    did not move, which isolates the real limiter: the QK^T contraction
    at K=d=16 (<=12.5% MXU) that no kernel layout can widen, amortized
    better by XLA's M=nW*2304 batched slab einsums than by per-window
    M=2304 programs. Negative result kept with its data; the kernel
    stays correct + tested (tests/test_flash_attention.py) behind the
    flag."""
    return os.environ.get("SR_TPU_FLASH") == "1"


@functools.partial(jax.jit, static_argnames=("heads", "window_size",
                                             "scale", "chunk_rows",
                                             "interpret"))
def msa_flash_attention(qkv_img, bias, *, heads: int, window_size: int,
                        scale: float | None = None,
                        chunk_rows: int | None = None,
                        interpret: bool | None = None):
    """Unshifted window MSA with online-softmax kv chunking.

    Args:
      qkv_img: (B, H, W, 3C); H, W multiples of window_size.
      bias: (heads, N, N) f32 relative position bias, N = ws^2.
    Returns:
      (B, H, W, C) attention output (pre out-projection), image layout.
    """
    b, h_img, w_img, c3 = qkv_img.shape
    c = c3 // 3
    ws = window_size
    d = c // heads
    n = ws * ws
    if scale is None:
        scale = d ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cr = chunk_rows or _flash_chunk_rows(ws)
    nch = ws // cr
    nwy, nwx = h_img // ws, w_img // ws

    qkv = qkv_img.reshape(b, h_img, w_img, 3, heads, d)
    q_hd = qkv[:, :, :, 0].transpose(3, 0, 1, 2, 4)   # (heads, B, H, W, d)
    k_hd = qkv[:, :, :, 1].transpose(3, 0, 1, 2, 4)
    v_hd = qkv[:, :, :, 2].transpose(3, 0, 1, 2, 4)
    # the kernel runs transposed (scores (Tk, N), lanes = queries), so the
    # bias streams as bias[h, query, key]^T; XLA fuses this transpose into
    # the bias gather that builds the dense table
    bias_t = jnp.swapaxes(bias, 1, 2)

    grid = (b, heads, nwy, nch, nwx)
    out = pl.pallas_call(
        functools.partial(_msa_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ws, ws, d),
                         lambda bb, h, i, ch, j: (h, bb, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cr, ws, d),
                         lambda bb, h, i, ch, j, _nch=nch:
                         (h, bb, i * _nch + ch, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cr, ws, d),
                         lambda bb, h, i, ch, j, _nch=nch:
                         (h, bb, i * _nch + ch, j, 0),
                         memory_space=pltpu.VMEM),
            # bias chunk: constant across the innermost window-col sweep
            # -> one fetch per (head, chunk) per window row
            pl.BlockSpec((1, cr * ws, n),
                         lambda bb, h, i, ch, j: (h, ch, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, d, n),
            lambda bb, h, i, ch, j, _nwx=nwx: (h, bb, i * _nwx + j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((heads, b, nwy * nwx, d, n),
                                       qkv_img.dtype),
        scratch_shapes=[
            pltpu.VMEM((nwx, d, n), jnp.float32),
            pltpu.VMEM((nwx, 1, n), jnp.float32),
            pltpu.VMEM((nwx, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(q_hd, k_hd, v_hd, bias_t)
    # (heads, B, nW, d, N) -> (B, H, W, C)
    out = out.transpose(1, 2, 4, 0, 3).reshape(b, nwy, nwx, ws, ws, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h_img, w_img, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def msa_flash_attention_ad(qkv_img, bias, heads, window_size, scale):
    """Flash forward, XLA backward."""
    return msa_flash_attention(qkv_img, bias, heads=heads,
                               window_size=window_size, scale=scale)


def _msa_flash_ad_fwd(qkv_img, bias, heads, window_size, scale):
    out = msa_flash_attention(qkv_img, bias, heads=heads,
                              window_size=window_size, scale=scale)
    return out, (qkv_img, bias)


def _msa_flash_ad_bwd(heads, window_size, scale, res, g):
    qkv_img, bias = res
    _, vjp = jax.vjp(
        lambda a, b_: msa_qtile_reference(a, b_, heads, window_size, scale),
        qkv_img, bias)
    return vjp(g.astype(qkv_img.dtype))


msa_flash_attention_ad.defvjp(_msa_flash_ad_fwd, _msa_flash_ad_bwd)
