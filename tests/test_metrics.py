"""Golden tests: PSNR/SSIM and color conversions vs the cv2-based reference."""

import numpy as np
import pytest

from super_resolution_tpu.metrics import (calculate_psnr, calculate_psnr_jnp,
                                          calculate_ssim, calculate_ssim_jnp)
from super_resolution_tpu.utils.color import bgr2ycbcr, rgb2ycbcr


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(42)
    base = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    noisy = np.clip(base.astype(np.int16) + rng.integers(-12, 12, base.shape),
                    0, 255).astype(np.uint8)
    return base, noisy


def _ref_metrics():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.metrics.psnr_ssim import calculate_psnr as p, calculate_ssim as s
    return p, s


@pytest.mark.parametrize("crop_border", [0, 4])
@pytest.mark.parametrize("y", [False, True])
def test_psnr_matches_reference(imgs, crop_border, y):
    ref_psnr, _ = _ref_metrics()
    a, b = imgs
    ours = calculate_psnr(a, b, crop_border=crop_border, test_y_channel=y)
    ref = ref_psnr(a, b, crop_border=crop_border, test_y_channel=y)
    assert ours == pytest.approx(ref, abs=1e-8)


@pytest.mark.parametrize("crop_border", [0, 4])
@pytest.mark.parametrize("y", [False, True])
def test_ssim_matches_reference(imgs, crop_border, y):
    _, ref_ssim = _ref_metrics()
    a, b = imgs
    ours = calculate_ssim(a, b, crop_border=crop_border, test_y_channel=y)
    ref = ref_ssim(a, b, crop_border=crop_border, test_y_channel=y)
    assert ours == pytest.approx(ref, abs=1e-9)


def test_color_matches_reference(imgs):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.utils.color_util import bgr2ycbcr as ref_bgr, rgb2ycbcr as ref_rgb

    a = imgs[0]
    np.testing.assert_allclose(rgb2ycbcr(a, y_only=True), ref_rgb(a, y_only=True))
    np.testing.assert_allclose(bgr2ycbcr(a, y_only=True), ref_bgr(a, y_only=True))
    af = a.astype(np.float32) / 255.0
    np.testing.assert_allclose(rgb2ycbcr(af), ref_rgb(af), atol=1e-6)


def test_jnp_psnr_close_to_numpy(imgs):
    a, b = imgs
    # jnp path takes RGB [0,1] NHWC; numpy path takes BGR uint8 [0,255].
    a01 = a[..., ::-1].astype(np.float32)[None] / 255.0
    b01 = b[..., ::-1].astype(np.float32)[None] / 255.0
    ours_np = calculate_psnr(a, b, crop_border=2, test_y_channel=True)
    ours_j = float(np.asarray(
        calculate_psnr_jnp(a01, b01, crop_border=2, test_y_channel=True))[0])
    assert ours_j == pytest.approx(ours_np, abs=2e-3)


def test_jnp_ssim_close_to_numpy(imgs):
    a, b = imgs
    a01 = a[..., ::-1].astype(np.float32)[None] / 255.0
    b01 = b[..., ::-1].astype(np.float32)[None] / 255.0
    ours_np = calculate_ssim(a, b, crop_border=0, test_y_channel=True)
    ours_j = float(np.asarray(
        calculate_ssim_jnp(a01, b01, crop_border=0, test_y_channel=True))[0])
    # jnp path is the fast on-device validation metric (f32); the numpy path
    # is the protocol-exact metric used for final eval.
    assert ours_j == pytest.approx(ours_np, abs=5e-4)


def test_psnr_identical_images(imgs):
    a, _ = imgs
    assert calculate_psnr(a, a, crop_border=0) == float("inf")
    assert calculate_ssim(a, a, crop_border=0) == pytest.approx(1.0)


def test_niqe_matches_reference():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.metrics.niqe import calculate_niqe as ref_niqe

    from super_resolution_tpu.metrics.niqe import calculate_niqe

    # structured synthetic image (pure noise can hit degenerate AGGD fits)
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:224, 0:256]
    img = (np.sin(xx / 9.0) * 80 + np.cos(yy / 13.0) * 60 + 120
           + rng.normal(0, 12, (224, 256)))
    img = np.clip(img, 0, 255)[:, :, None].repeat(3, axis=2).astype(np.float32)
    ours = calculate_niqe(img, crop_border=0)
    ref = ref_niqe(img, crop_border=0)
    assert ours == pytest.approx(ref, abs=1e-4)
