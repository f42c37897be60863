"""Shape-bucketed, cross-image batched tiled inference.

The reference evaluates benchmark sets one image at a time with eager
shapes (ref: hat/models/hat_model.py:16-26 pre_process + the per-image
loop in hat_model.py:114-185). Under XLA, per-image shapes mean one
multi-minute compile per distinct image size — Urban100 has ~100 of them
— and batch-1 tiles leave the MXU idle (the round-2 verdict's "metric's
own regime is the slow one").

This module fixes both at once, exactly:

  - Every image's tile plan (runtime/tile.py inward-shifted windows) is
    computed on the host over its TRUE dims, so gathered windows contain
    only real pixels. Images are zero-padded to a shared bucket canvas
    whose padding is therefore never read: the batched result is
    bit-identical to the per-image ``tile_forward`` with the same plan.
  - All tiles of all images in a bucket run as ONE fixed-shape program:
    plan indices (window starts, paste positions, image ids) are passed
    as device data, not baked shapes, so one compile serves the bucket.
    Cross-image batching fills the tile-batch axis the per-image path
    could not (a 176x256 LR is a single tile at batch 1).

Bucket signature = (window shape, center shape, quantized canvas dims,
n images, n tiles). A benchmark set of ~100 varied sizes collapses to a
handful of signatures -> a handful of compiles.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# the bit-identical contract with the per-image engine requires the SAME
# planner, not a copy of its math
from super_resolution_tpu.runtime.tile import _axis_plan as _plan


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _quant_up(dim: int, q: int) -> int:
    return -(-dim // q) * q


def group_images(shapes: Sequence[Tuple[int, int]], tile_size, tile_pad,
                 quant: int = 32) -> Dict[tuple, List[int]]:
    """Group image indices by batched-plan signature.

    Images whose (h, w) produce the same static window/center shapes and
    the same quantized canvas dims share one compiled program. Images
    smaller than the padded tile window get per-size signatures (their
    window clamps to the image), which still merges identical sizes.
    """
    ts_y, ts_x = _pair(tile_size)
    tp_y, tp_x = _pair(tile_pad)
    groups: Dict[tuple, List[int]] = {}
    for i, (h, w) in enumerate(shapes):
        t_y = min(ts_y + 2 * tp_y, h)
        t_x = min(ts_x + 2 * tp_x, w)
        cs_y, cs_x = min(ts_y, h), min(ts_x, w)
        key = (t_y, t_x, cs_y, cs_x, _quant_up(h, quant), _quant_up(w, quant))
        groups.setdefault(key, []).append(i)
    return groups


# One traceable program per (apply_fn, statics); jit's own cache then
# specializes per array shape (G, Hb, Wb, N) — so a signature recurs at
# zero compile cost.
_PROGRAM_CACHE: Dict[tuple, Callable] = {}


def _get_program(apply_fn, scale, t_y, t_x, cs_y, cs_x, chunk, mesh):
    key = (id(apply_fn), scale, t_y, t_x, cs_y, cs_x, chunk,
           id(mesh) if mesh is not None else None)
    if key in _PROGRAM_CACHE:
        return _PROGRAM_CACHE[key][0]

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

    @jax.jit
    def run(params, canvas_in, sy, sx, oy, ox, py, px, img_idx):
        g, hb, wb, c = canvas_in.shape

        def gather(ii, y0, x0):
            return jax.lax.dynamic_slice(
                canvas_in, (ii, y0, x0, 0), (1, t_y, t_x, c))[0]

        tiles = jax.vmap(gather)(img_idx, sy, sx)       # (N, T_y, T_x, C)

        if mesh is not None:
            def fwd(t):
                t = jax.lax.with_sharding_constraint(
                    t, NamedSharding(mesh, P("data")))
                return apply_fn(params, t)
        else:
            def fwd(t):
                return apply_fn(params, t)
        out = jax.lax.map(fwd, tiles.reshape(-1, chunk, t_y, t_x, c))
        out = out.reshape(-1, t_y * scale, t_x * scale, c)

        canvas = jnp.zeros((g, hb * scale, wb * scale, c), out.dtype)

        def paste(i, cv):
            center = jax.lax.dynamic_slice(
                out[i], (oy[i] * scale, ox[i] * scale, 0),
                (cs_y * scale, cs_x * scale, c))
            return jax.lax.dynamic_update_slice(
                cv, center[None], (img_idx[i], py[i] * scale,
                                   px[i] * scale, 0))

        return jax.lax.fori_loop(0, out.shape[0], paste, canvas)

    # keep apply_fn AND mesh alive so neither id() can be recycled onto
    # this key by a later, different object
    _PROGRAM_CACHE[key] = (run, apply_fn, mesh)
    return run


def tile_forward_group(apply_fn: Callable, params, imgs: Sequence,
                       scale: int, tile_size, tile_pad, chunk: int = 8,
                       quant: int = 32, mesh=None) -> List:
    """Tiled upscale of a same-signature group of images in one program.

    Args:
      apply_fn: (params, batched NHWC) -> NHWC x`scale` forward. Passed
        params stay a jit argument (never baked as program constants).
      imgs: list of (1, h_i, w_i, C) arrays sharing a group_images
        signature.
    Returns:
      list of (1, h_i*scale, w_i*scale, C) arrays, same order.
    """
    ts_y, ts_x = _pair(tile_size)
    tp_y, tp_x = _pair(tile_pad)
    dims = [(int(im.shape[1]), int(im.shape[2])) for im in imgs]
    c = int(imgs[0].shape[3])
    g = len(imgs)

    plans = []
    t_shape = cs_shape = None
    for h, w in dims:
        ny, t_y, cs_y, st_y, off_y, pos_y = _plan(h, ts_y, tp_y)
        nx, t_x, cs_x, st_x, off_x, pos_x = _plan(w, ts_x, tp_x)
        if t_shape is None:
            t_shape, cs_shape = (t_y, t_x), (cs_y, cs_x)
        elif (t_y, t_x) != t_shape or (cs_y, cs_x) != cs_shape:
            raise ValueError(
                "images in a tile group must share window/center shapes "
                f"(got {(t_y, t_x)} vs {t_shape}); group with group_images")
        plans.append((np.repeat(st_y, nx), np.tile(st_x, ny),
                      np.repeat(off_y, nx), np.tile(off_x, ny),
                      np.repeat(pos_y, nx), np.tile(pos_x, ny)))

    t_y, t_x = t_shape
    cs_y, cs_x = cs_shape
    # canvas = quantized bucket dims, so the compiled shape is stable for
    # every group with this signature
    hb = _quant_up(max(h for h, _ in dims), quant)
    wb = _quant_up(max(w for _, w in dims), quant)

    sy = np.concatenate([p[0] for p in plans])
    sx = np.concatenate([p[1] for p in plans])
    oy = np.concatenate([p[2] for p in plans])
    ox = np.concatenate([p[3] for p in plans])
    py = np.concatenate([p[4] for p in plans])
    px = np.concatenate([p[5] for p in plans])
    img_idx = np.concatenate(
        [np.full(len(p[0]), i, np.int32) for i, p in enumerate(plans)])
    n = len(sy)
    chunk = min(chunk, n)
    if mesh is not None:
        n_dev = mesh.devices.size
        chunk = max(chunk, n_dev) // n_dev * n_dev
    n_pad = (-n) % chunk
    if n_pad:
        # pad with duplicates of the first tile: pasting identical content
        # twice is idempotent, so correctness is unaffected
        rep = lambda a: np.concatenate([a, np.repeat(a[:1], n_pad)])
        sy, sx, oy, ox, py, px, img_idx = map(
            rep, (sy, sx, oy, ox, py, px, img_idx))

    canvas_in = np.zeros((g, hb, wb, c), np.float32)
    for i, im in enumerate(imgs):
        h, w = dims[i]
        canvas_in[i, :h, :w] = np.asarray(im[0], np.float32)

    run = _get_program(apply_fn, scale, t_y, t_x, cs_y, cs_x, chunk, mesh)
    out = np.asarray(run(
        params, jnp.asarray(canvas_in),
        *(jnp.asarray(a.astype(np.int32))
          for a in (sy, sx, oy, ox, py, px, img_idx))))
    return [out[i:i + 1, :h * scale, :w * scale] for i, (h, w)
            in enumerate(dims)]


def bucketed_tile_eval(apply_fn: Callable, params, imgs: Sequence,
                       scale: int, tile_size, tile_pad, chunk: int = 8,
                       quant: int = 32, mesh=None) -> List:
    """Evaluate a whole varied-size image list with a handful of compiles.

    Groups by plan signature (group_images), runs each group through one
    compiled program (tile_forward_group), returns results in input order.
    """
    shapes = [(int(im.shape[1]), int(im.shape[2])) for im in imgs]
    groups = group_images(shapes, tile_size, tile_pad, quant)
    results: List = [None] * len(imgs)
    for key, idxs in groups.items():
        outs = tile_forward_group(apply_fn, params, [imgs[i] for i in idxs],
                                  scale, tile_size, tile_pad, chunk, quant,
                                  mesh=mesh)
        for i, o in zip(idxs, outs):
            results[i] = o
    return results
