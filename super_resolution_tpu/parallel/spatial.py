"""Spatially-sharded SR inference with ICI halo exchange.

The tile engine (runtime/tile.py) treats tiles as a batch axis — simple
and mesh-shardable, but every tile recomputes its halo, wasting
(tile+2*pad)^2/tile^2 of the FLOPs. For very large inputs (the 4K->8K
north-star config) this module shards the image ROW-wise across the mesh
instead and exchanges only the halo rows between neighbor devices over
ICI via `jax.lax.ppermute` — the 2-D analog of ring attention. The
reference has no equivalent (its tile loop is serial python,
hat/models/hat_model.py:40-108); SURVEY.md §5.7 flags this variant as a
pure TPU win.

Window semantics match the tile engine's inward-shifted windows: every
device processes a static (band + 2*halo)-row window. Border devices
have no outer neighbor, so their window extends *inward* (device 0 takes
2*halo extra rows from the next device, the last device from the
previous) — all content is real pixels, and the network zero-pads only
at true image edges, exactly like the whole-image forward. If `halo`
covers the network's effective receptive field the result equals the
unsharded forward up to fp tolerance (pinned by
tests/test_spatial_shard.py with an exact-receptive-field CNN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def spatial_shard_forward(apply_fn, img, scale: int, mesh, halo: int,
                          axis: str = "data"):
    """Row-sharded upscale of (1, H, W, C) -> (1, H*scale, W*scale, C).

    apply_fn: NHWC -> NHWC x`scale` network forward (any batch; called with
      batch 1 per device). Must accept (band + 2*halo)-row inputs.
    mesh: jax Mesh with `axis`; H must divide by the axis size, and each
      band must be at least 2*halo rows.
    halo: rows of neighbor context per side (the tile engine's tile_pad).
    """
    n = int(mesh.shape[axis])
    _, h, w, c = img.shape
    if n == 1:
        return apply_fn(img)
    band, rem = divmod(h, n)
    if rem:
        raise ValueError(f"H={h} must divide the '{axis}' mesh size {n}")
    if band < 2 * halo:
        raise ValueError(
            f"band {band} rows < 2*halo ({2 * halo}): lower halo or use "
            "fewer devices (border windows shift inward by 2*halo)")

    def worker(x):
        x = x[0]                               # (band, W, C) local rows
        idx = jax.lax.axis_index(axis)
        # neighbor halo exchange over ICI: bottom rows flow to the next
        # device, top rows to the previous; edge devices receive zeros
        # (unused — their window is selected to stay inside the image)
        from_prev = jax.lax.ppermute(
            x[-2 * halo:], axis, [(i, i + 1) for i in range(n - 1)])
        from_next = jax.lax.ppermute(
            x[:2 * halo], axis, [(i + 1, i) for i in range(n - 1)])
        first = jnp.concatenate([x, from_next], axis=0)
        inner = jnp.concatenate(
            [from_prev[halo:], x, from_next[:halo]], axis=0)
        last = jnp.concatenate([from_prev, x], axis=0)
        win = jnp.where(idx == 0, first,
                        jnp.where(idx == n - 1, last, inner))
        out = apply_fn(win[None])[0]           # ((band+2h)*s, W*s, C)
        off = jnp.where(idx == 0, 0,
                        jnp.where(idx == n - 1, 2 * halo, halo))
        out = jax.lax.dynamic_slice(
            out, (off * scale, 0, 0), (band * scale, w * scale, c))
        return out[None]

    shard = jax.shard_map(worker, mesh=mesh, in_specs=P(None, axis),
                          out_specs=P(None, axis))
    return shard(img)
