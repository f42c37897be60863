"""On-device tiled inference engine.

The reference's tile mode is a serial Python loop — one forward per tile
with host-side slicing and pasting, and halos clamped at image borders so
border tiles shrink (ref: hat/models/hat_model.py:40-108). Shrinking tiles
are shape-dynamic, so the TPU engine uses *inward-shifted windows*:

  - every tile window has one static size T = min(tile + 2*pad, dim); at
    borders the window slides inward (start = clip(center - pad, 0,
    dim - T)), so all content is real pixels and the network zero-pads only
    at true image edges — identical border behavior to the whole-image
    forward (and a strict improvement on the reference's clamped tiles,
    which lose halo context at borders);
  - each tile contributes a static-size center block pasted at
    p_i = min(i*tile, dim - tile) (right-aligned at the end); overlapping
    pastes write identical true content, so order is irrelevant.

All tiles run as ONE batch through fixed-size lax.map chunks — a single
compiled program, MXU-saturating batch shapes, zero host round-trips. The
tile axis doubles as the multi-chip axis (parallel/mesh.py shards it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _axis_plan(dim: int, tile_size: int, tile_pad: int):
    """Static per-axis plan.

    Returns (n_tiles, window_size, center_size, window_starts,
    center_offsets_in_window, canvas_positions) — all numpy, baked at trace
    time.
    """
    n = max(1, -(-dim // tile_size))  # ceil
    t = min(tile_size + 2 * tile_pad, dim)
    cs = min(tile_size, dim)
    pos = np.minimum(np.arange(n) * tile_size, max(dim - cs, 0))
    starts = np.clip(pos - tile_pad, 0, dim - t)
    offsets = pos - starts
    return n, t, cs, starts.astype(np.int32), offsets.astype(np.int32), pos.astype(np.int32)


def tile_forward(apply_fn, img, scale: int, tile_size, tile_pad,
                 chunk: int = 8, mesh=None):
    """Tiled upscale of (1, H, W, C) -> (1, H*scale, W*scale, C).

    apply_fn: batched NHWC -> NHWC x`scale` network forward. Every tile
    shares one compiled shape (T_y, T_x).

    tile_size / tile_pad: int, or (y, x) pairs — rectangular tiles let the
    plan kill halo waste along an axis the image covers in one tile (e.g.
    tile (720, 256) on a 720-row input has no vertical halo at all).

    chunk: tiles per compiled forward (the lax.map batch). Clamped to the
    actual tile count so small images don't pay for padded batch slots.

    mesh: optional jax Mesh — the per-chunk tile batch is sharded over the
    'data' axis so each device upscales its slice of tiles (multi-chip
    tiled inference; the reference's serial tile loop has no analog —
    SURVEY.md §2.7). `chunk` should be a multiple of the mesh size.
    """
    _, h, w, c = img.shape
    ts_y, ts_x = tile_size if isinstance(tile_size, (tuple, list)) \
        else (tile_size, tile_size)
    tp_y, tp_x = tile_pad if isinstance(tile_pad, (tuple, list)) \
        else (tile_pad, tile_pad)
    ny, t_y, cs_y, st_y, off_y, pos_y = _axis_plan(h, ts_y, tp_y)
    nx, t_x, cs_x, st_x, off_x, pos_x = _axis_plan(w, ts_x, tp_x)
    chunk = min(chunk, ny * nx)

    sy = jnp.asarray(np.repeat(st_y, nx))
    sx = jnp.asarray(np.tile(st_x, ny))
    oy = jnp.asarray(np.repeat(off_y, nx))
    ox = jnp.asarray(np.tile(off_x, ny))
    py = jnp.asarray(np.repeat(pos_y, nx))
    px = jnp.asarray(np.tile(pos_x, ny))

    def gather(y0, x0):
        return jax.lax.dynamic_slice(img[0], (y0, x0, 0), (t_y, t_x, c))

    tiles = jax.vmap(gather)(sy, sx)                      # (nT, T_y, T_x, C)

    n = tiles.shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        chunk = max(chunk, n_dev) // n_dev * n_dev

        def sharded_apply(t):
            t = jax.lax.with_sharding_constraint(
                t, NamedSharding(mesh, P("data")))
            return apply_fn(t)

        fwd = sharded_apply
    else:
        fwd = apply_fn
    n_pad = (-n) % chunk
    if n_pad:
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((n_pad,) + tiles.shape[1:], tiles.dtype)])
    out = jax.lax.map(fwd, tiles.reshape(-1, chunk, t_y, t_x, c))
    out = out.reshape(-1, t_y * scale, t_x * scale, c)[:n]

    def center(tile_out, y_off, x_off):
        return jax.lax.dynamic_slice(
            tile_out, (y_off * scale, x_off * scale, 0),
            (cs_y * scale, cs_x * scale, c))

    centers = jax.vmap(center)(out, oy, ox)               # (nT, cs_y*s, cs_x*s, C)

    canvas = jnp.zeros((h * scale, w * scale, c), out.dtype)

    def paste(i, cv):
        return jax.lax.dynamic_update_slice(
            cv, centers[i], (py[i] * scale, px[i] * scale, 0))

    canvas = jax.lax.fori_loop(0, n, paste, canvas)
    return canvas[None]
