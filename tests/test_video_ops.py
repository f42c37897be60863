"""Parity tests for the video-stack primitives: flow_warp and the
TPU-native modulated deformable convolution (DCNv2)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _ref_arch_util():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.archs import arch_util
    return arch_util


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_flow_warp_parity(rng, padding_mode):
    from super_resolution_tpu.ops.flow import flow_warp

    au = _ref_arch_util()
    x = rng.random((2, 9, 11, 4), dtype=np.float32)
    flow = (rng.random((2, 9, 11, 2), dtype=np.float32) - 0.5) * 6
    ref = au.flow_warp(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       torch.from_numpy(flow),
                       padding_mode=padding_mode).numpy()
    ours = flow_warp(jnp.asarray(x), jnp.asarray(flow),
                     padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_resize_bilinear_ac_parity(rng):
    from super_resolution_tpu.ops.flow import resize_bilinear_ac

    x = rng.random((2, 5, 7, 3), dtype=np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(10, 14),
        mode="bilinear", align_corners=True).numpy()
    ours = resize_bilinear_ac(jnp.asarray(x), 10, 14)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_naive_deform_conv_matches_plain_conv(rng):
    """With zero offsets and mask=None the oracle must equal F.conv2d —
    sanity-pins the oracle itself."""
    from reference_oracle import naive_deform_conv2d

    x = torch.from_numpy(rng.random((2, 6, 8, 9), dtype=np.float32))
    w = torch.from_numpy(rng.random((4, 6, 3, 3), dtype=np.float32) - 0.5)
    off = torch.zeros(2, 2 * 2 * 9, 8, 9)
    out = naive_deform_conv2d(x, off, w, None, (1, 1), (1, 1), (1, 1), None)
    expect = torch.nn.functional.conv2d(x, w, padding=1)
    np.testing.assert_allclose(out.numpy(), expect.numpy(), atol=1e-5)


@pytest.mark.parametrize("stride,padding,dg", [(1, 1, 1), (1, 1, 2), (2, 1, 4)])
def test_modulated_deform_conv_parity(rng, stride, padding, dg):
    from reference_oracle import naive_deform_conv2d
    from super_resolution_tpu.ops.deform_conv import modulated_deform_conv2d

    b, cin, h, w, cout, k = 2, 8, 10, 9, 6, 3
    ho = (h + 2 * padding - (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - (k - 1) - 1) // stride + 1
    x = rng.random((b, h, w, cin), dtype=np.float32)
    weight = (rng.random((cout, cin, k, k), dtype=np.float32) - 0.5)
    bias = rng.random(cout, dtype=np.float32)
    offset = (rng.random((b, ho, wo, 2 * dg * k * k), dtype=np.float32) - 0.5) * 4
    mask = rng.random((b, ho, wo, dg * k * k), dtype=np.float32)

    ref = naive_deform_conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(offset.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(weight), torch.from_numpy(bias),
        (stride, stride), (padding, padding), (1, 1),
        torch.from_numpy(mask.transpose(0, 3, 1, 2)).contiguous()).numpy()

    ours = modulated_deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), jnp.asarray(bias), stride=stride,
        padding=padding, deformable_groups=dg)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1),
                               atol=2e-5)
