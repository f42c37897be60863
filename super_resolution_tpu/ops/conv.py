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
