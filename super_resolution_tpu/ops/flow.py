"""Optical-flow warping + flow-resolution helpers (NHWC).

TPU-native rebuild of the reference's flow utilities
(ref: basicsr/archs/arch_util.py:113-146 flow_warp, :148-180 resize_flow).
Warping is four gathers + a lerp (see ops/grid_sample.py); XLA vectorizes
the gathers on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.grid_sample import _bilinear_gather


def flow_warp(x, flow, interp_mode: str = "bilinear",
              padding_mode: str = "zeros", align_corners: bool = True):
    """Warp x by optical flow (ref: arch_util.py:113-145).

    Args:
      x: (B, H, W, C) feature/image.
      flow: (B, H, W, 2) displacement in pixels, channel order (dx, dy).
    Note the reference normalizes to [-1, 1] and calls grid_sample with
    align_corners=True; sampling positions are exactly grid + flow, so we
    skip the normalize/denormalize round-trip.
    """
    assert interp_mode == "bilinear", interp_mode
    h, w = x.shape[1], x.shape[2]
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flow.dtype),
                          jnp.arange(w, dtype=flow.dtype), indexing="ij")
    ix = gx + flow[..., 0]
    iy = gy + flow[..., 1]
    if not align_corners:
        # torch maps the normalized grid back through the half-pixel rule
        ix = (2.0 * ix / max(w - 1, 1) + 1.0) * 0.5 * w - 0.5
        iy = (2.0 * iy / max(h - 1, 1) + 1.0) * 0.5 * h - 0.5
    return _bilinear_gather(x, ix, iy, padding_mode)


def resize_bilinear_ac(img, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True (torch F.interpolate parity);
    used for flow upsampling in SpyNet pyramids (ref: spynet_arch.py:66)."""
    b, h, w, c = img.shape
    del b, c
    ys = jnp.linspace(0.0, h - 1.0, out_h) if out_h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, w - 1.0, out_w) if out_w > 1 else jnp.zeros((1,))
    iy, ix = jnp.meshgrid(ys, xs, indexing="ij")
    return _bilinear_gather(img, ix[None].astype(img.dtype),
                            iy[None].astype(img.dtype), "border")


def avg_pool2(x):
    """2x2 stride-2 average pool, floor mode (torch F.avg_pool2d parity with
    count_include_pad=False and no padding)."""
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    x = x[:, :h2 * 2, :w2 * 2]
    return nn.avg_pool(x, (2, 2), strides=(2, 2))
