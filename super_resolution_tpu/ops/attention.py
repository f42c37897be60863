"""Window attention with relative position bias — XLA reference path.

This is the always-correct baseline implementation every Pallas kernel is
tested against (SURVEY.md §7.6). It covers:

- square window MSA with RPB and optional shift mask (classic HAT / SwinIR
  structure, ref: basicsr/archs/swinir_arch.py:95-192) and ESC's
  WindowAttention (ref: hat/archs/esc_arch.py:162-253);
- rectangular OCAB attention: Nq=ws^2 queries vs Nk=ow^2 overlapping keys
  with a gathered RPB (ref: hat/archs/hat_arch.py:326-393).

Layout: heads are folded into the batch-of-windows dimension; matmuls are
(N, d) x (d, M) per window — XLA batches them onto the MXU.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def relative_position_index_sa(window_size: int) -> np.ndarray:
    """Swin-style relative position index, (ws^2, ws^2) int32
    (ref: hat_arch.py:770-781)."""
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1).astype(np.int32)


def relative_position_index_oca(window_size: int, overlap_ratio: float) -> np.ndarray:
    """OCAB q-vs-overlap-window relative index, (ws^2, ow^2) int32
    (ref: hat_arch.py:783-803)."""
    ws = window_size
    we = ws + int(overlap_ratio * ws)
    coords_ori = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat_ori = coords_ori.reshape(2, -1)
    coords_ext = np.stack(np.meshgrid(np.arange(we), np.arange(we), indexing="ij"))
    flat_ext = coords_ext.reshape(2, -1)
    rel = flat_ext[:, None, :] - flat_ori[:, :, None]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - we + 1
    rel[:, :, 1] += ws - we + 1
    rel[:, :, 0] *= ws + we - 1
    return rel.sum(-1).astype(np.int32)


def shift_attn_mask(h: int, w: int, window_size: int, shift_size: int) -> np.ndarray:
    """(nW, ws^2, ws^2) additive mask of 0 / -100 for shifted windows
    (ref: hat_arch.py:805-818). Computed statically at trace time."""
    img_mask = np.zeros((h, w))
    slices = (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[hs, ws_] = cnt
            cnt += 1
    nh, nw = h // window_size, w // window_size
    mw = img_mask.reshape(nh, window_size, nw, window_size)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def shift_attn_mask_jnp(h: int, w: int, window_size: int, shift_size: int):
    """shift_attn_mask built from on-device iota ops instead of a baked
    numpy literal: at large image sizes the literal is enormous
    ((H/ws * W/ws, ws^2, ws^2) f32 — ~280 MB for a 720x384 band at ws 16)
    and oversizes the compiled program (the axon compile tunnel rejects
    it outright). Shapes are static; values are computed by XLA."""
    ws, ss = window_size, shift_size

    def region(n):
        idx = jnp.arange(n)
        return jnp.where(idx < n - ws, 0,
                         jnp.where(idx < n - ss, 1, 2)).astype(jnp.float32)

    img = region(h)[:, None] * 3.0 + region(w)[None, :]         # (H, W)
    mw = img.reshape(h // ws, ws, w // ws, ws)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, ws * ws)          # (nW, N)
    diff = mw[:, None, :] - mw[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


def attention_with_bias(q, k, v, bias, scale=None, precision=None):
    """softmax(q k^T * scale + bias) v.

    Scores and softmax are always float32: with bfloat16 operands the MXU
    accumulates in f32 (preferred_element_type) and the exp/normalize run in
    f32, then the probabilities drop back to the value dtype for the second
    matmul — the standard mixed-precision attention recipe. For float32
    inputs this is numerically identical to the plain einsum chain.

    Args:
      q: (..., Nq, d); k, v: (..., Nk, d)
      bias: broadcastable to (..., Nq, Nk) — RPB (+ optional shift mask).
      scale: defaults to d**-0.5.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    attn = jnp.einsum("...qd,...kd->...qk", q * scale, k, precision=precision,
                      preferred_element_type=jnp.float32)
    attn = attn + bias.astype(jnp.float32)
    attn = jnp.exp(attn - attn.max(axis=-1, keepdims=True))
    attn = attn / attn.sum(axis=-1, keepdims=True)
    return jnp.einsum("...qk,...kd->...qd", attn.astype(v.dtype), v,
                      precision=precision)


def window_msa(qkv_windows, num_heads: int, bias, scale=None, precision=None):
    """Multi-head window attention over batched windows.

    Args:
      qkv_windows: (3, B*nW, N, C)
      bias: (num_heads, N, N) or (B*nW//B? ...) broadcastable to
        (B*nW, num_heads, N, N).
    Returns:
      (B*nW, N, C)
    """
    _, bw, n, c = qkv_windows.shape
    d = c // num_heads
    qkv = qkv_windows.reshape(3, bw, n, num_heads, d).transpose(0, 1, 3, 2, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    out = attention_with_bias(q, k, v, bias, scale=scale, precision=precision)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)


def _pallas_attention_enabled() -> bool:
    """Route production attention to the Pallas fused kernel on TPU.

    Default on TPU per scripts/compare_attn.py measurements (see README
    Benchmark notes); SR_TPU_ATTN=xla|pallas overrides either way."""
    import os

    import jax

    mode = os.environ.get("SR_TPU_ATTN", "auto").lower()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu" and _PALLAS_DEFAULT_ON_TPU


def fused_route_enabled() -> bool:
    """_pallas_attention_enabled AND not under tensor parallelism.

    The gate for fused megakernel routes whose weights GSPMD shards under
    TP (OCAB / SwinIR / SRFormer / ATD / HiT-SRF / ESC): a pallas_call has
    no GSPMD partitioning rule, so feeding it column/row-sharded weights
    would force an all-gather at the kernel boundary — the XLA path lets
    GSPMD keep the Megatron layout. The HATClassic W-MSA route does NOT
    use this gate: it composes with TP head-parallel
    (parallel/tp_attention.py)."""
    from super_resolution_tpu.parallel.tp import tp_active

    return _pallas_attention_enabled() and not tp_active()


# Measured on v5e (scripts/compare_attn.py, bw=2048 bf16):
#   OCAB ws16 Nq256/Nk576: XLA 68.9 ms, Pallas 67.4 ms (+2.2%)
#   MSA  ws16 Nq256/Nk256: XLA 48.2 ms, Pallas 47.5 ms (+1.6%)
# Both paths sit at the d=30 MXU output-tile floor (K<128 is pipeline-
# padded, so score cost ~ M*N regardless of head dim); the kernel's edge
# is small but consistent, and it keeps the ~7 GB/call f32 score tensor
# out of HBM — freeing headroom for larger tile chunks. v1 (f32-upcast
# operands, pre-transposed layouts) lost to XLA; v2 fixed both.
_PALLAS_DEFAULT_ON_TPU = True


def attention_with_bias_auto(q, k, v, bias, scale=None, slab: int = 640):
    """Memory-bounded window attention for big window batches.

    A single einsum over all windows of a tile batch materializes the full
    (BW, heads, Nq, Nk) f32 score tensor — 10.5 GB for an 8-tile OCAB batch,
    which OOMs HBM and saturates bandwidth. Slabs of `slab` windows run
    through an outer lax.map, bounding peak score memory to ~1.8 GB while
    keeping the MXU-friendly einsum inside (measured on v5e: +13%% tiled
    HAT throughput over the unslabbed path via the larger feasible tile
    chunk). Numerically identical to attention_with_bias.

    On TPU the Pallas fused kernel (ops/pallas_attention.py — scores never
    touch HBM) is selected instead when _pallas_attention_enabled().

    q: (BW, heads, Nq, d); k, v: (BW, heads, Nk, d); bias (heads, Nq, Nk).
    """
    from jax import lax

    if _pallas_attention_enabled():
        from super_resolution_tpu.ops.pallas_attention import (
            fused_attention_ad)

        if scale is None:
            scale = q.shape[-1] ** -0.5
        bias_full = jnp.broadcast_to(bias, bias.shape[-3:]) \
            if bias.ndim >= 3 else bias
        return fused_attention_ad(q, k, v, bias_full, scale)

    bw = q.shape[0]
    if bw <= slab:
        return attention_with_bias(q, k, v, bias, scale=scale)
    pad = (-bw) % slab
    if pad:
        def padw(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        q, k, v = padw(q), padw(k), padw(v)
    m = q.shape[0] // slab
    out = lax.map(
        lambda qkv: attention_with_bias(qkv[0], qkv[1], qkv[2], bias,
                                        scale=scale),
        (q.reshape((m, slab) + q.shape[1:]),
         k.reshape((m, slab) + k.shape[1:]),
         v.reshape((m, slab) + v.shape[1:])))
    return out.reshape((m * slab,) + out.shape[2:])[:bw]
