"""Degradation subsystem: blur kernels vs reference, device ops vs torch,
DiffJPEG round-trip parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def _ref_degradations():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.data import degradations
    return degradations


def test_bivariate_gaussian_matches_reference():
    ref = _ref_degradations()
    from super_resolution_tpu.data.degradations import bivariate_gaussian
    for iso in (True, False):
        ours = bivariate_gaussian(21, 2.0, 3.0, 0.7, isotropic=iso)
        theirs = ref.bivariate_Gaussian(21, 2.0, 3.0, 0.7, isotropic=iso)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_generalized_and_plateau_match_reference():
    ref = _ref_degradations()
    from super_resolution_tpu.data.degradations import (
        bivariate_generalized_gaussian, bivariate_plateau)
    ours = bivariate_generalized_gaussian(21, 2.0, 1.0, 0.3, 1.5, isotropic=False)
    theirs = ref.bivariate_generalized_Gaussian(21, 2.0, 1.0, 0.3, 1.5,
                                                isotropic=False)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    ours = bivariate_plateau(21, 1.5, 2.5, -0.4, 2.0, isotropic=False)
    theirs = ref.bivariate_plateau(21, 1.5, 2.5, -0.4, 2.0, isotropic=False)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_sinc_kernel_matches_reference():
    ref = _ref_degradations()
    from super_resolution_tpu.data.degradations import circular_lowpass_kernel
    for cutoff, ks, pad in ((np.pi / 3, 13, 21), (2.5, 21, 0)):
        ours = circular_lowpass_kernel(cutoff, ks, pad_to=pad)
        theirs = ref.circular_lowpass_kernel(cutoff, ks, pad_to=pad)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_random_mixed_kernels_valid(rng):
    from super_resolution_tpu.data.degradations import random_mixed_kernels
    for _ in range(10):
        k = random_mixed_kernels(
            ["iso", "aniso", "generalized_iso", "generalized_aniso",
             "plateau_iso", "plateau_aniso"],
            [0.4, 0.2, 0.1, 0.1, 0.1, 0.1], kernel_size=21, rng=rng)
        assert k.shape == (21, 21)
        assert k.sum() == pytest.approx(1.0)
        assert np.all(np.isfinite(k))


def test_filter2d_matches_torch(rng):
    ref = _ref_degradations()
    from basicsr.utils.img_process_util import filter2D as ref_filter2D
    from super_resolution_tpu.ops.degrade import filter2d_batch

    img = rng.random((3, 16, 20, 3), dtype=np.float32)
    kern = rng.random((3, 7, 7), dtype=np.float32)
    kern /= kern.sum(axis=(1, 2), keepdims=True)
    ours = np.asarray(filter2d_batch(jnp.asarray(img), jnp.asarray(kern)))
    theirs = ref_filter2D(torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
                          torch.from_numpy(kern)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_usm_sharp_matches_torch(rng):
    from basicsr.utils.img_process_util import USMSharp
    from super_resolution_tpu.ops.degrade import usm_gaussian_kernel, usm_sharp
    from reference_oracle import install_stubs
    install_stubs()

    img = rng.random((2, 32, 32, 3), dtype=np.float32)
    usm = USMSharp(radius=13)
    ours = np.asarray(usm_sharp(jnp.asarray(img), usm_gaussian_kernel(13)))
    theirs = usm(torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous())
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_diffjpeg_matches_reference(rng):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.utils.diffjpeg import DiffJPEG
    from super_resolution_tpu.ops.diffjpeg import jpeg_compress_decompress

    img = rng.random((2, 24, 40, 3), dtype=np.float32)
    jpeger = DiffJPEG(differentiable=False)
    quality = torch.tensor([30.0, 80.0])
    with torch.no_grad():
        ref_out = jpeger(torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
                         quality=quality.clone()).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(jpeg_compress_decompress(jnp.asarray(img),
                                               jnp.asarray([30.0, 80.0]),
                                               differentiable=False))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5)


def test_diffjpeg_differentiable_gradients(rng):
    from super_resolution_tpu.ops.diffjpeg import jpeg_compress_decompress

    img = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))

    def f(x):
        return jnp.sum(jpeg_compress_decompress(x, 50.0) ** 2)

    g = jax.grad(f)(img)
    assert bool(jnp.any(g != 0)) and bool(jnp.all(jnp.isfinite(g)))


def test_noise_ops_statistics(rng):
    from super_resolution_tpu.ops.degrade import (add_gaussian_noise,
                                                  add_poisson_noise)

    img = jnp.full((4, 32, 32, 3), 0.5, jnp.float32)
    out = add_gaussian_noise(jax.random.PRNGKey(0), img,
                             sigma_range=(10, 10.0001), gray_prob=0.0)
    resid = np.asarray(out - img)
    assert resid.std() == pytest.approx(10 / 255, rel=0.1)
    out = add_poisson_noise(jax.random.PRNGKey(1), img,
                            scale_range=(1.0, 1.0001), gray_prob=0.0)
    assert float(jnp.abs(out - img).mean()) > 0
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= 0.0


def test_resize_modes_match_torch(rng):
    import torch.nn.functional as F

    from super_resolution_tpu.ops.degrade import resize_to

    img = rng.random((2, 16, 16, 3), dtype=np.float32)
    t = torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous()
    for mode in ("bilinear", "bicubic", "area"):
        for size in ((11, 23), (32, 8)):
            ours = np.asarray(resize_to(jnp.asarray(img), *size, mode))
            theirs = F.interpolate(t, size=size, mode=mode).numpy()
            np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1),
                                       atol=1e-5, err_msg=f"{mode} {size}")
