"""Unit + golden tests for the core TPU ops (windowing, shuffle, conv, attn)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from super_resolution_tpu.ops import (
    attention_with_bias, dynamic_depthwise_conv3x3, extract_overlap_windows,
    pad_to_multiple, pixel_shuffle, pixel_unshuffle,
    relative_position_index_oca, relative_position_index_sa,
    window_partition, window_reverse)


def test_window_partition_roundtrip(rng):
    x = rng.random((2, 16, 24, 5), dtype=np.float32)
    wins = window_partition(x, 8)
    assert wins.shape == (2 * 2 * 3, 8, 8, 5)
    back = window_reverse(wins, 8, 16, 24)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_window_partition_matches_torch(rng):
    from reference_oracle import get_hat_arch
    hat_arch = get_hat_arch()
    x = rng.random((2, 16, 16, 4), dtype=np.float32)
    ours = np.asarray(window_partition(x, 8))
    ref = hat_arch.window_partition(torch.from_numpy(x), 8).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_pixel_shuffle_matches_torch(rng):
    x = rng.random((2, 6, 7, 12), dtype=np.float32)
    ours = np.asarray(pixel_shuffle(x, 2))
    ref = torch.nn.functional.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_pixel_unshuffle_inverse(rng):
    x = rng.random((1, 8, 8, 12), dtype=np.float32)
    np.testing.assert_array_equal(
        np.asarray(pixel_unshuffle(pixel_shuffle(x, 2), 2)), x)


def test_extract_overlap_windows_matches_unfold(rng):
    ws, ow = 8, 12  # overlap_ratio 0.5
    x = rng.random((2, 16, 24, 6), dtype=np.float32)
    ours = np.asarray(extract_overlap_windows(x, ws, ow))
    # torch unfold on NCHW, then reshape as the reference OCAB does
    # (hat_arch.py:359-364)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    unfold = torch.nn.Unfold(kernel_size=(ow, ow), stride=ws, padding=(ow - ws) // 2)
    ref = unfold(xt)  # (B, C*ow*ow, nW)
    b, _, nw = ref.shape
    c = x.shape[3]
    ref = ref.reshape(b, c, ow * ow, nw).permute(0, 3, 2, 1).reshape(b * nw, ow * ow, c)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)


def test_dynamic_depthwise_conv_matches_torch(rng):
    b, h, w, c = 3, 10, 12, 4
    x = rng.random((b, h, w, c), dtype=np.float32)
    kern = rng.random((b, 3, 3, c), dtype=np.float32)
    ours = np.asarray(dynamic_depthwise_conv3x3(x, kern))
    # torch: grouped conv trick from the reference (esc_arch.py:110-116)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).reshape(1, b * c, h, w)
    kt = torch.from_numpy(kern.transpose(0, 3, 1, 2)).reshape(b * c, 1, 3, 3)
    ref = torch.nn.functional.conv2d(xt, kt, stride=1, padding=1, groups=b * c)
    ref = ref.reshape(b, c, h, w).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_attention_with_bias_matches_naive(rng):
    q = rng.random((4, 2, 9, 8), dtype=np.float32)
    k = rng.random((4, 2, 16, 8), dtype=np.float32)
    v = rng.random((4, 2, 16, 8), dtype=np.float32)
    bias = rng.random((2, 9, 16), dtype=np.float32)
    ours = np.asarray(attention_with_bias(q, k, v, bias, scale=8 ** -0.5))
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    score = qt @ kt.transpose(-2, -1) * (8 ** -0.5) + torch.from_numpy(bias)
    ref = (torch.softmax(score, dim=-1) @ vt).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rpi_match_reference():
    from reference_oracle import get_hat_arch
    hat_arch = get_hat_arch()
    m = hat_arch.HAT(img_size=32, embed_dim=12, depths=(1,), num_heads=(2,),
                     window_size=8, overlap_ratio=0.5, upscale=2,
                     upsampler="pixelshuffle")
    np.testing.assert_array_equal(relative_position_index_sa(8),
                                  m.calculate_rpi_sa().numpy())
    np.testing.assert_array_equal(relative_position_index_oca(8, 0.5),
                                  m.calculate_rpi_oca().numpy())


def test_shift_mask_matches_reference():
    from reference_oracle import get_hat_arch
    from super_resolution_tpu.ops import shift_attn_mask
    hat_arch = get_hat_arch()
    m = hat_arch.HAT(img_size=32, embed_dim=12, depths=(1,), num_heads=(2,),
                     window_size=8, overlap_ratio=0.5, upscale=2,
                     upsampler="pixelshuffle")
    ref = m.calculate_mask((32, 24)).numpy()
    ours = shift_attn_mask(32, 24, window_size=8, shift_size=4)
    np.testing.assert_array_equal(ours, ref)


def test_pad_to_multiple(rng):
    x = rng.random((1, 13, 17, 3), dtype=np.float32)
    xp, (ph, pw) = pad_to_multiple(x, 8)
    assert xp.shape == (1, 16, 24, 3) and (ph, pw) == (3, 7)
    ref = torch.nn.functional.pad(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (0, pw, 0, ph), "reflect")
    np.testing.assert_array_equal(np.asarray(xp),
                                  ref.numpy().transpose(0, 2, 3, 1))


def test_conv2d_s2d_matches_direct(rng):
    """Space-to-depth conv (the MXU-friendly route for small-channel
    large-kernel convs, ops/conv.py) is exactly the direct conv."""
    from super_resolution_tpu.ops.conv import conv2d_nhwc, conv2d_nhwc_s2d

    for (h, w, ci, co, k, blk) in [(20, 24, 16, 16, 13, 4),
                                   (17, 19, 16, 16, 13, 4),
                                   (32, 32, 16, 16, 13, 2),
                                   (15, 15, 3, 5, 7, 4),
                                   (9, 13, 4, 4, 3, 4)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, ci)).astype(np.float32))
        kern = jnp.asarray(
            rng.standard_normal((co, ci, k, k)).astype(np.float32))
        a = np.asarray(conv2d_nhwc(x, kern))
        b = np.asarray(conv2d_nhwc_s2d(x, kern, block=blk))
        np.testing.assert_allclose(a, b, atol=2e-3,
                                   err_msg=f"{(h, w, ci, co, k, blk)}")


def test_shift_attn_mask_jnp_matches_numpy():
    from super_resolution_tpu.ops.attention import (shift_attn_mask,
                                                    shift_attn_mask_jnp)

    for (h, w, ws, ss) in [(16, 16, 8, 4), (24, 16, 8, 4), (32, 48, 16, 8)]:
        ref = shift_attn_mask(h, w, ws, ss)
        got = np.asarray(shift_attn_mask_jnp(h, w, ws, ss))
        np.testing.assert_array_equal(got, ref, err_msg=f"{(h, w, ws, ss)}")
