"""Spatially-sharded halo-exchange inference (parallel/spatial.py).

With halo >= the network's receptive-field radius, the row-sharded
forward must equal the unsharded whole-image forward — the same
equivalence contract the tile engine pins, but with halos exchanged over
ICI (ppermute) instead of recomputed per tile.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from super_resolution_tpu.parallel.spatial import spatial_shard_forward


def _make_net(rng, c_in=3, c_mid=8, scale=2, k=5, n_layers=3):
    """Small conv stack + pixel-shuffle; receptive-field radius
    n_layers*(k//2) = 6 rows."""
    from super_resolution_tpu.ops.conv import conv2d_nhwc
    from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle

    kernels = []
    cs = [c_in] + [c_mid] * (n_layers - 1) + [c_mid]
    for i in range(n_layers):
        kernels.append(jnp.asarray(rng.standard_normal(
            (cs[i + 1], cs[i], k, k)).astype(np.float32) * 0.1))
    k_out = jnp.asarray(rng.standard_normal(
        (c_in * scale * scale, c_mid, 3, 3)).astype(np.float32) * 0.1)

    def apply_fn(x):
        for kern in kernels:
            x = jax.nn.leaky_relu(conv2d_nhwc(x, kern))
        return pixel_shuffle(conv2d_nhwc(x, k_out), scale)

    return apply_fn


def test_spatial_shard_matches_unsharded(rng):
    mesh = Mesh(np.array(jax.devices()), ("data",))
    n = mesh.devices.size
    apply_fn = _make_net(rng)
    scale, halo = 2, 8  # halo > rf radius (6)
    h, w = 8 * n * 4, 24
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))

    ref = jax.jit(apply_fn)(x)
    got = jax.jit(lambda im: spatial_shard_forward(
        apply_fn, im, scale, mesh, halo))(x)
    assert got.shape == (1, h * scale, w * scale, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_spatial_shard_validation(rng):
    mesh = Mesh(np.array(jax.devices()), ("data",))
    apply_fn = _make_net(rng)
    x = jnp.zeros((1, 8 * mesh.devices.size + 1, 16, 3))
    with pytest.raises(ValueError, match="must divide"):
        spatial_shard_forward(apply_fn, x, 2, mesh, halo=2)
    x = jnp.zeros((1, 8 * mesh.devices.size, 16, 3))
    with pytest.raises(ValueError, match="2\\*halo"):
        spatial_shard_forward(apply_fn, x, 2, mesh, halo=8)


def test_spatial_shard_single_device(rng):
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    apply_fn = _make_net(rng)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    got = spatial_shard_forward(apply_fn, x, 2, mesh, halo=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(apply_fn(x)),
                               atol=1e-6)
