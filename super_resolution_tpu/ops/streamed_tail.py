"""Row-streamed reconstruction tail.

The HAT upsampler tail (conv_before_upsample -> [conv -> pixel_shuffle]* ->
conv_last; ref: hat/archs/hat_arch.py:593-605 ``Upsample`` + :855-857) is
the activation-memory peak of tiled inference: at the HD bench plan the
stage-2 upsample conv emits (chunk, 2T_y, 2T_x, 4*64) while the shuffled
(chunk, 4T_y, 4T_x, 64) map is still live -- ~5 GB bf16, 3.8x the RHAG
body's working set (BENCH_r03.json est_activation_mb), which is what capped
the tile plan at 720x160 (the 720x640 plan OOM'd, bench.py r3 sweep).

The tail is a pure stack of SAME-padded 3x3 convs + pixel shuffles: local,
with a row receptive field of <= 3 input rows (x4: 1 at 1x + 1 at 1x +
1 at 2x + 1 at 4x = 2.75). So it streams exactly over row bands using the
same inward-shifted static windows as the tile engine (runtime/tile.py):

  - every band window has one static height t = band + 2*halo; at the
    top/bottom image edge the window slides inward, so band boundaries
    coincide with true image edges there, where SAME zero padding matches
    the whole-image forward bit-for-bit;
  - interior band edges see zeros instead of neighbor rows, corrupting
    < halo rows on each side -- cropped away before pasting. halo >= 3
    makes the stream exact (up to XLA op-scheduling reassociation).

``lax.map`` runs one band at a time, so the live set is one band's tail
activations + the (small, 3-channel) output -- the peak drops ~T_y/t-fold.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def streamed_rows(fn, x, out_scale: int, band_rows: int, halo: int = 4):
    """Apply ``fn`` over row bands of ``x``: (B, H, W, C) ->
    (B, H*out_scale, W', C').

    fn must be shift-invariant with SAME zero padding and a row receptive
    field <= halo (a stack of 3x3 convs / pixel-shuffles qualifies), and
    must scale the row count by exactly ``out_scale``. Falls back to a
    single ``fn(x)`` call when banding would not shrink the working set.
    """
    B, H, W, C = x.shape
    t = band_rows + 2 * halo
    if band_rows <= 0 or H <= t:
        return fn(x)
    n = -(-H // band_rows)                       # ceil
    cs = band_rows
    pos = np.minimum(np.arange(n) * band_rows, H - cs)
    starts = np.clip(pos - halo, 0, H - t)
    offsets = (pos - starts).astype(np.int32)

    def one(args):
        s0, off = args
        band = jax.lax.dynamic_slice(x, (0, s0, 0, 0), (B, t, W, C))
        r = fn(band)
        return jax.lax.dynamic_slice(
            r, (0, off * out_scale, 0, 0),
            (B, cs * out_scale, r.shape[2], r.shape[3]))

    outs = jax.lax.map(one, (jnp.asarray(starts, jnp.int32),
                             jnp.asarray(offsets, jnp.int32)))
    if n * cs == H:
        # centers tile the height exactly -> pure reshape, no paste pass
        return jnp.moveaxis(outs, 0, 1).reshape(
            B, H * out_scale, outs.shape[3], outs.shape[4])
    posj = jnp.asarray(pos.astype(np.int32))
    canvas = jnp.zeros((B, H * out_scale, outs.shape[3], outs.shape[4]),
                       outs.dtype)

    def paste(i, cv):
        # overlapping pastes (right-aligned last band) write identical
        # true content, so order is irrelevant
        return jax.lax.dynamic_update_slice(
            cv, outs[i], (0, posj[i] * out_scale, 0, 0))

    return jax.lax.fori_loop(0, n, paste, canvas)
