"""Convolution primitives in NHWC for the TPU compute path.

Flax's nn.Conv covers the standard cases; these helpers cover the ones the
reference needed CUDA tricks for:

- ``dynamic_depthwise_conv3x3``: ESC's per-sample dynamic depthwise conv.
  The reference reshapes batch into conv groups (``1,(b*c),h,w`` with
  ``groups=b*pdim`` — ref: hat/archs/esc_arch.py:110-116), a cuDNN-specific
  trick. On TPU the same contraction is expressed as a 9-tap
  shift-and-weight sum: extract the 3x3 shifted neighborhoods (zero-padded)
  and contract with the per-sample kernels via einsum — pure VPU work that
  XLA fuses; no grouped conv or vmap needed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv2d_nhwc(x, kernel_oihw, bias=None, stride: int = 1, padding=None,
                groups: int = 1, dilation: int = 1, precision=None):
    """NHWC conv with a torch-layout (O, I/g, kh, kw) kernel.

    Used by weight-converted paths so kernels keep torch layout in the
    checkpoint tree; XLA transposes at compile time for free.
    """
    kh, kw = kernel_oihw.shape[2], kernel_oihw.shape[3]
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    elif isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = lax.conv_general_dilated(
        x, kernel_oihw.transpose(2, 3, 1, 0),  # HWIO
        window_strides=(stride, stride), padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, precision=precision)
    if bias is not None:
        out = out + bias
    return out


def depthwise_conv_nhwc(x, kernel_hwc, bias=None, padding=None, precision=None):
    """Depthwise conv: kernel (kh, kw, C) applied per channel."""
    kh, kw, c = kernel_hwc.shape
    if padding is None:
        padding = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = lax.conv_general_dilated(
        x, kernel_hwc.reshape(kh, kw, 1, c),
        window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=precision)
    if bias is not None:
        out = out + bias
    return out


def _s2d_kernel(kernel_oihw, block: int):
    """Transform a conv kernel to its space-to-depth equivalent.

    A kxk conv on C channels becomes a k'xk' conv on C*block^2 channels
    with k' = span of block offsets — e.g. 13x13 on 16ch -> 6x6 on 256ch at
    block 4. Exact (zero-pad) semantics; the win is MXU lane utilization:
    XLA cannot tile a 16-lane conv onto the 128-lane MXU (measured ~2.5%
    FLOP efficiency on v5e) while the transformed 256x256-channel conv is
    a standard well-tiled conv.

    Returns (T_hwio, pad_lo_h, pad_hi_h, pad_lo_w, pad_hi_w) where the pads
    are the block-space conv padding.
    """
    o, i, kh, kw = kernel_oihw.shape
    ph, pw = kh // 2, kw // 2
    b = block

    def axis_span(kk, p):
        jmin = (0 - p) // b
        jmax = (b - 1 + kk - 1 - p) // b
        return jmin, jmax

    jmin_h, jmax_h = axis_span(kh, ph)
    jmin_w, jmax_w = axis_span(kw, pw)
    kh2, kw2 = jmax_h - jmin_h + 1, jmax_w - jmin_w + 1

    # T[ah, aw, (ph_, pw_), i, (qh, qw), o] = k[u, v, i, o] with
    # u = (ah + jmin_h)*b + ph_ - qh + ph (and likewise v); out-of-range
    # u/v are zeros. One gather from a zero-padded kernel — numpy index
    # tables, no scatter (scatter HLO here made 36-block models take
    # minutes longer to compile).
    import numpy as np

    def axis_idx(kk, p, jmin, n):
        a = np.arange(n)[:, None, None]
        phase_in = np.arange(b)[None, :, None]
        phase_out = np.arange(b)[None, None, :]
        u = (a + jmin) * b + phase_in - phase_out + p
        off = max(0, -int(u.min()))
        hi = max(0, int(u.max()) - (kk - 1))
        return u + off, off, hi

    u_idx, off_h, hi_h = axis_idx(kh, ph, jmin_h, kh2)   # (KH2, b, b)
    v_idx, off_w, hi_w = axis_idx(kw, pw, jmin_w, kw2)   # (KW2, b, b)
    k_perm = kernel_oihw.transpose(2, 3, 1, 0)           # (KH, KW, I, O)
    kpad = jnp.pad(k_perm, ((off_h, hi_h), (off_w, hi_w), (0, 0), (0, 0)))
    uu = u_idx[:, None, :, None, :, None]                # (KH2,1,b,1,b,1)
    vv = v_idx[None, :, None, :, None, :]                # (1,KW2,1,b,1,b)
    uu, vv = np.broadcast_arrays(uu, vv)   # (KH2,KW2,b,b,b,b): ph,pw,qh,qw
    t = kpad[uu, vv]                       # (..., I, O)
    t = t.reshape(kh2, kw2, b * b, b * b, i, o)
    t = t.transpose(0, 1, 2, 4, 3, 5)      # (KH2, KW2, pin, I, pout, O)
    t = t.reshape(kh2, kw2, b * b * i, b * b * o)        # HWIO
    return t, -jmin_h, jmax_h, -jmin_w, jmax_w


def s2d_transform(x, block: int = 4):
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), phases major / channels minor
    (the input layout conv2d_s2d_pre expects). H, W must divide block."""
    b_, h, w, c = x.shape
    blk = block
    xs = x.reshape(b_, h // blk, blk, w // blk, blk, c)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(b_, h // blk, w // blk,
                                                  blk * blk * c)


def conv2d_s2d_pre(xs, kernel_oihw, out_hw, block: int = 4, bias=None):
    """s2d conv from an already-transformed input (see s2d_transform).

    xs: (B, H/b, W/b, b*b*Cin); out_hw: the original (H, W).
    Returns (B, H, W, Cout).
    """
    b_, hb, wb, _ = xs.shape
    blk = block
    h, w = out_hw
    t, plo_h, phi_h, plo_w, phi_w = _s2d_kernel(kernel_oihw, blk)
    out = lax.conv_general_dilated(
        xs, t.astype(xs.dtype), window_strides=(1, 1),
        padding=((plo_h, phi_h), (plo_w, phi_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    o = kernel_oihw.shape[0]
    out = out.reshape(b_, hb, wb, blk, blk, o)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b_, hb * blk, wb * blk, o)
    out = out[:, :h, :w]
    if bias is not None:
        out = out + bias
    return out


def conv2d_nhwc_s2d(x, kernel_oihw, bias=None, block: int = 4):
    """Same-padding NHWC conv via the space-to-depth transform.

    Numerically equivalent to ``conv2d_nhwc(x, kernel_oihw)`` (zero pad,
    stride 1) for any H, W; pads H/W up to a block multiple internally.
    Use for small-channel large-kernel convs (ESC's 13x13 PLK filter,
    ref: hat/archs/esc_arch.py:321-323) where direct lowering starves
    the MXU.
    """
    b_, h, w, c = x.shape
    blk = block
    pad_h = (-h) % blk
    pad_w = (-w) % blk
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    xs = s2d_transform(x, blk)
    return conv2d_s2d_pre(xs, kernel_oihw, (h, w), blk, bias=bias)


def shifted_neighborhoods(x, k: int, mode: str = "zero"):
    """Stack the k*k shifted copies of x: (B,H,W,C) -> (B,H,W,k*k,C).

    Tap ordering is row-major (dy, dx) over the kernel window, matching a
    conv kernel flattened as (kh, kw).
    """
    pad = k // 2
    if mode == "zero":
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    else:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)
    h, w = x.shape[1], x.shape[2]
    taps = [xp[:, dy:dy + h, dx:dx + w, :] for dy in range(k) for dx in range(k)]
    return jnp.stack(taps, axis=3)


def dynamic_depthwise_conv(x, kernels):
    """Per-sample dynamic depthwise conv for arbitrary odd k (zero pad).

    Args:
      x: (B, H, W, C); kernels: (B, k, k, C).
    Uses the batch-into-groups trick (one grouped conv with B*C groups) —
    unlike the 3x3 shift-einsum, memory stays O(HWC) for large k.
    """
    b, h, w, c = x.shape
    k = kernels.shape[1]
    pad = k // 2
    xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * c)
    kg = kernels.transpose(1, 2, 0, 3).reshape(k, k, 1, b * c)
    out = lax.conv_general_dilated(
        xg, kg, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return out.reshape(h, w, b, c).transpose(2, 0, 1, 3)


def dynamic_depthwise_conv3x3(x, kernels):
    """Per-sample dynamic depthwise 3x3 conv (zero padding).

    Args:
      x: (B, H, W, C)
      kernels: (B, 3, 3, C) per-sample depthwise kernels.
    Returns:
      (B, H, W, C) — for each sample b and channel c, x[b,:,:,c] convolved
      (cross-correlated) with kernels[b,:,:,c].
    """
    taps = shifted_neighborhoods(x, 3)                      # (B,H,W,9,C)
    kflat = kernels.reshape(kernels.shape[0], 9, -1)        # (B,9,C)
    return jnp.einsum("bhwkc,bkc->bhwc", taps, kflat)
