"""Bilinear grid sampling (torch F.grid_sample parity) in NHWC jax.

Needed by DySample's content-aware resampler (ref:
hat/archs/esc_real_arch.py:361-399). Supports align_corners=False with
border padding — the combination DySample uses. Expressed as four gathers +
a lerp; gathers vectorize fine on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(img, grid, align_corners: bool = False,
                         padding_mode: str = "border"):
    """img: (B, H, W, C); grid: (B, Ho, Wo, 2) with normalized (x, y) in
    [-1, 1]. padding_mode 'border' or 'zeros' (torch parity).
    Returns (B, Ho, Wo, C)."""
    b, h, w, c = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        ix = (gx + 1) * 0.5 * (w - 1)
        iy = (gy + 1) * 0.5 * (h - 1)
    else:
        ix = (gx + 1) * 0.5 * w - 0.5
        iy = (gy + 1) * 0.5 * h - 0.5
    return _bilinear_gather(img, ix, iy, padding_mode)


def _bilinear_gather(img, ix, iy, padding_mode: str = "border"):
    """Bilinear sample at pixel coordinates ix/iy (B, ...spatial...).
    'zeros' zeroes per-corner out-of-bounds taps (torch grid_sample
    semantics); 'border' clamps."""
    b, h, w, _c = img.shape

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0

    def clampx(v):
        return jnp.clip(v, 0, w - 1).astype(jnp.int32)

    def clampy(v):
        return jnp.clip(v, 0, h - 1).astype(jnp.int32)

    x0c, x1c = clampx(x0), clampx(x0 + 1)
    y0c, y1c = clampy(y0), clampy(y0 + 1)

    bidx = jnp.arange(b).reshape((b,) + (1,) * (ix.ndim - 1))
    v00 = img[bidx, y0c, x0c]
    v01 = img[bidx, y0c, x1c]
    v10 = img[bidx, y1c, x0c]
    v11 = img[bidx, y1c, x1c]

    if padding_mode == "zeros":
        dt = img.dtype

        def validx(v):
            return ((v >= 0) & (v <= w - 1)).astype(dt)[..., None]

        def validy(v):
            return ((v >= 0) & (v <= h - 1)).astype(dt)[..., None]

        v00 = v00 * (validy(y0) * validx(x0))
        v01 = v01 * (validy(y0) * validx(x0 + 1))
        v10 = v10 * (validy(y0 + 1) * validx(x0))
        v11 = v11 * (validy(y0 + 1) * validx(x0 + 1))
    elif padding_mode != "border":
        raise NotImplementedError(padding_mode)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy
