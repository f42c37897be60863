"""Golden tests: MATLAB bicubic imresize vs the reference torch port."""

import numpy as np
import pytest

from super_resolution_tpu.utils.matlab import imresize, imresize_jnp


def _ref_imresize(img, scale, antialiasing=True):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.utils.matlab_functions import imresize as ref
    return ref(img, scale, antialiasing)


@pytest.mark.parametrize("scale", [0.25, 1 / 3, 0.5, 2.0, 3.0, 4.0])
@pytest.mark.parametrize("shape", [(17, 23), (32, 32), (41, 13)])
def test_imresize_matches_reference(rng, scale, shape):
    img = rng.random((*shape, 3), dtype=np.float32)
    ours = imresize(img, scale)
    ref = _ref_imresize(img, scale)
    assert ours.shape == ref.shape
    # reference accumulates in float32; ours in float64 — tolerance is
    # float32 rounding noise
    np.testing.assert_allclose(ours, ref, atol=6e-6)


def test_imresize_grayscale(rng):
    img = rng.random((20, 30), dtype=np.float32)
    ours = imresize(img, 0.5)
    ref = _ref_imresize(img, 0.5)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("scale", [0.5, 2.0])
def test_imresize_jnp_matches_numpy(rng, scale):
    img = rng.random((2, 24, 36, 3), dtype=np.float32)
    out_j = np.asarray(imresize_jnp(img, scale))
    for b in range(img.shape[0]):
        out_np = imresize(img[b], scale)
        np.testing.assert_allclose(out_j[b], out_np, atol=1e-5)
