"""Pixel shuffle / unshuffle in NHWC with torch-channel-order parity.

The channel ordering matters for weight conversion: torch's pixel_shuffle
maps input channel ``c*r^2 + i*r + j`` to output channel ``c`` at spatial
offset (i, j) (ref: hat_arch.py:593-605 Upsample; esc_arch.py:384-386).
Converted conv weights keep torch's output-channel order, so the NHWC
shuffle must follow the same ordering.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x, r: int):
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch-ordering compatible."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x, r: int):
    """(B, H*r, W*r, C) -> (B, H, W, C*r^2), inverse of pixel_shuffle
    (ref: basicsr/archs/arch_util.py:186)."""
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h, w, c * r * r)
