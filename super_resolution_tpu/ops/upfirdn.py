"""upfirdn2d and fused bias+leaky-ReLU — XLA replacements for the
reference's CUDA extensions.

The reference ships two CUDA kernels for StyleGAN2's resampling path
(ref: basicsr/ops/upfirdn2d/src/upfirdn2d_kernel.cu, 370 lines CUDA;
basicsr/ops/fused_act/src/fused_bias_act_kernel.cu). On TPU both are
single XLA ops: upfirdn2d is exactly a conv_general_dilated with
lhs_dilation (upsample) + window strides (downsample), and fused bias+act
is a fusion XLA performs on its own (SURVEY.md §2.6).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """Upsample -> FIR filter -> downsample (NHWC).

    Args:
      x: (B, H, W, C); kernel: (kh, kw) FIR filter.
      up/down: integer resampling factors; pad: (pad0, pad1) applied to
      both spatial dims (reference upfirdn2d convention).
    """
    kh, kw = kernel.shape
    c = x.shape[-1]
    # flip: reference applies correlation with the flipped kernel (true
    # convolution); conv_general_dilated correlates, so flip here
    k = jnp.flip(jnp.asarray(kernel, x.dtype), (0, 1))
    kern = k[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    pad0, pad1 = pad
    # torch's upfirdn pads up-1 zeros after the LAST sample too (H -> H*up);
    # lhs_dilation gives (H-1)*up+1, so fold the difference into the tail pad
    return lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=[(pad0, pad1 + up - 1), (pad0, pad1 + up - 1)],
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5):
    """bias + leaky relu + scale (ref: fused_act.py; XLA fuses this chain)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def make_resample_kernel(k) -> jnp.ndarray:
    """1D list -> normalized 2D resampling kernel (ref: stylegan2 utils)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)
