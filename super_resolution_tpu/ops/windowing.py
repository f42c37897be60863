"""Window partition/reverse and overlapping-window extraction, NHWC.

TPU-native reimplementation of the reference's window helpers
(ref: HAT/hat/archs/hat_arch.py:124-134 window_partition/window_reverse;
OCAB's nn.Unfold overlap extraction at hat_arch.py:296-297,359-364).
Everything here is pure reshape/transpose (free under XLA — fused into
surrounding ops) or a conv_general_dilated_patches gather.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * nWh * nWw, ws, ws, C). H, W must divide ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size, window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size, window_size, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """Inverse of :func:`window_partition`."""
    b = windows.shape[0] // (h * w // window_size // window_size)
    x = windows.reshape(b, h // window_size, w // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def extract_overlap_windows(x, window_size: int, overlap_win_size: int):
    """Overlapping window extraction for OCAB K/V (zero-padded).

    Equivalent to the reference's
    ``nn.Unfold(kernel_size=ow, stride=ws, padding=(ow - ws)//2)``
    (hat_arch.py:296-297) but NHWC and gather-based.

    Args:
      x: (B, H, W, C) with H, W multiples of window_size.
    Returns:
      (B * nWh * nWw, ow*ow, C)
    """
    b, h, w, c = x.shape
    ws, ow = window_size, overlap_win_size
    pad = (ow - ws) // 2
    nh, nw = h // ws, w // ws
    # Two axis gathers on channel-last data instead of NCHW
    # conv_general_dilated_patches + a 5D scatter-transpose: the patches
    # route lowered to a ~1.5s/layer transpose on v5e (57% of the whole
    # tiled HAT step); row/col gathers keep C in the lanes throughout.
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    idx_h = jnp.arange(nh)[:, None] * ws + jnp.arange(ow)[None, :]
    idx_w = jnp.arange(nw)[:, None] * ws + jnp.arange(ow)[None, :]
    rows = xp[:, idx_h]                 # (B, nH, ow, W+2p, C)
    patches = rows[:, :, :, idx_w]      # (B, nH, ow, nW, ow, C)
    patches = patches.transpose(0, 1, 3, 2, 4, 5)
    return patches.reshape(b * nh * nw, ow * ow, c)


def pad_to_multiple(x, multiple: int, mode: str = "reflect"):
    """Pad NHWC H/W up to the next multiple (reference pre_process analog,
    ref: hat/models/hat_model.py:16-26). Returns (padded, (pad_h, pad_w))."""
    h, w = x.shape[1], x.shape[2]
    pad_h = (multiple - h % multiple) % multiple
    pad_w = (multiple - w % multiple) % multiple
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode=mode)
    return x, (pad_h, pad_w)
