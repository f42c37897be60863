"""Streamed reconstruction tail == plain tail, exactly.

The row-banded tail (ops/streamed_tail.py) must be numerically identical
to the monolithic conv->pixel-shuffle->conv chain it replaces (ref
upsampler: hat/archs/hat_arch.py:593-605 + :855-857): the inward-shifted
halo windows guarantee every output pixel is computed from the same
receptive field as the whole-image forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _pair(arch_name, scale, h, w, band):
    if arch_name == "classic":
        from super_resolution_tpu.models.hat_classic_arch import HATClassic
        mk = lambda s: HATClassic(
            embed_dim=24, depths=(1,), num_heads=(2,), window_size=4,
            compress_ratio=4, squeeze_factor=4, mlp_ratio=1.0,
            upscale=scale, drop_path_rate=0.0, stream_tail_rows=s)
    else:
        from super_resolution_tpu.models.hat_arch import HAT
        mk = lambda s: HAT(
            embed_dim=24, depths=(1,), num_heads=(2,), window_size=4,
            mlp_ratio=1.0, upscale=scale, drop_path_rate=0.0, esc_pdim=8,
            stream_tail_rows=s)
    plain, streamed = mk(0), mk(band)
    x = jnp.asarray(np.random.default_rng(0).random((2, h, w, 3)),
                    jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(params, x)
    got = streamed.apply(params, x)
    assert got.shape == ref.shape == (2, h * scale, w * scale, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=0)


@pytest.mark.parametrize("h,w,band", [
    (32, 16, 8),    # H divisible by band -> reshape fast path
    (36, 16, 8),    # ragged last band -> right-aligned paste path
    (16, 16, 8),    # H <= band + 2*halo -> single-call fallback
])
def test_classic_streamed_tail_exact(h, w, band):
    _pair("classic", 4, h, w, band)


def test_classic_streamed_tail_x3():
    _pair("classic", 3, 36, 16, 8)


def test_fork_streamed_tail_exact():
    _pair("fork", 4, 36, 16, 8)


def test_streamed_rows_helper_raw():
    """Helper-level check on a bare conv stack (no flax)."""
    from super_resolution_tpu.ops.streamed_tail import streamed_rows

    rng = np.random.default_rng(1)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 5, 8)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 2, 3)) * 0.1, jnp.float32)

    def fn(x):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
        y = pixel_shuffle(y, 2)
        return jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x = jnp.asarray(rng.random((1, 40, 12, 5)), jnp.float32)
    ref = fn(x)
    got = streamed_rows(fn, x, 2, 8, halo=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
