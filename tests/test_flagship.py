"""Flagship-scale golden parity (slow).

Round-1 parity was pinned only at toy dims (embed 20-60, depths (2,2));
these tests run the REAL production configs once with random converted
weights so the <=0.01 dB gate no longer rests on toy-shape extrapolation:

- fork-HAT base: embed 180, 6x6 RHAG, ws 16, overlap 0.5
  (ref: options/test/HAT_SRx4.yml:49-64) vs the mounted torch reference;
- HAT-S: embed 144, 6x6, ws 16, compress 24 / squeeze 24
  (ref: options/test/HAT-S_SRx4.yml network_g) vs the torch reference —
  per the reference CODE these kwargs drive the fork arch (SURVEY.md §0);
- SwinIR at its flagship dims (the classic window-MSA pattern official HAT
  checkpoints follow, ref: swinir_arch.py:95-192) vs the vendored SwinIR —
  full-model classic-tree parity at scale (HATClassic components are pinned
  vs the same oracle in test_hat_classic.py; the reference has no full
  classic-HAT module to run);
- the bf16 policy at flagship depth (36 blocks of error accumulation)
  vs the f32 output through the uint8 metric protocol.

Input is one 64x64 LR patch (the reference's Multi-Adds protocol size,
HAT/README.md:33-37).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict

FORK_KW = dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
               window_size=16, compress_ratio=3, squeeze_factor=30,
               conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
               upscale=4, upsampler="pixelshuffle")

HAT_S_KW = dict(img_size=64, embed_dim=144, depths=(6,) * 6,
                num_heads=(6,) * 6, window_size=16, compress_ratio=24,
                squeeze_factor=24, conv_scale=0.01, overlap_ratio=0.5,
                mlp_ratio=2.0, upscale=4, upsampler="pixelshuffle")


@pytest.mark.slow
def test_fork_hat_flagship_parity(rng):
    """Fork-HAT at full production dims vs the torch reference.

    atol 2e-3: f32 accumulation-order differences grow with depth (36
    blocks); observed max-abs deltas land well under this (the output range
    with random weights is ~[-2, 3], so 2e-3 is ~4e-4 relative)."""
    from reference_oracle import get_hat_arch

    from super_resolution_tpu.models.hat_arch import HAT

    hat_arch = get_hat_arch()
    torch.manual_seed(0)
    tm = hat_arch.HAT(**FORK_KW)
    tm.eval()
    fm = HAT(**FORK_KW)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])

    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jax.jit(
        lambda p, t: fm.apply({"params": p}, t))(params, jnp.asarray(x)))
    ref_nhwc = ref.transpose(0, 2, 3, 1)
    assert ours.shape == ref_nhwc.shape == (1, 256, 256, 3)
    np.testing.assert_allclose(ours, ref_nhwc, atol=2e-3)

    # bf16 policy at flagship depth: uint8 metric-protocol delta (the
    # <=0.01 dB budget is on PSNR-vs-GT, reference validation protocol).
    # Both legs run jitted — the production path (observed with these
    # converted weights: agreement 56.4 dB, delta 0.005 dB).
    from super_resolution_tpu.metrics.psnr_ssim import calculate_psnr
    from super_resolution_tpu.utils.img import tensor2img
    from super_resolution_tpu.utils.precision import cast_floating, wrap_apply

    fwd16 = jax.jit(wrap_apply(lambda p, t: fm.apply({"params": p}, t),
                               jnp.bfloat16))
    out16 = np.asarray(fwd16(cast_floating(params, jnp.bfloat16),
                             jnp.asarray(x)))
    img32, img16 = tensor2img(ours), tensor2img(out16)
    agreement = calculate_psnr(img32, img16, crop_border=0)
    assert agreement > 50.0, f"flagship bf16 agreement {agreement:.2f} dB"
    gt = tensor2img(rng.random((1, 256, 256, 3), dtype=np.float32))
    p32 = calculate_psnr(img32, gt, crop_border=4, test_y_channel=True)
    p16 = calculate_psnr(img16, gt, crop_border=4, test_y_channel=True)
    assert abs(p32 - p16) <= 0.01, f"flagship bf16 delta {abs(p32-p16):.4f} dB"


@pytest.mark.slow
def test_hat_s_flagship_parity(rng):
    """HAT-S kwargs through the fork arch (what `type: HAT` + the HAT-S
    yml actually instantiate in the reference) at production dims."""
    from reference_oracle import get_hat_arch

    from super_resolution_tpu.models.hat_arch import HAT

    hat_arch = get_hat_arch()
    torch.manual_seed(1)
    tm = hat_arch.HAT(**HAT_S_KW)
    tm.eval()
    fm = HAT(**HAT_S_KW)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])

    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-3)


@pytest.mark.slow
def test_swinir_flagship_parity(rng):
    """Classic window-MSA tree at SwinIR's flagship dims (embed 180, 6x6,
    ws 8 — the published SwinIR x4 config) vs the vendored reference."""
    from reference_oracle import get_swinir_arch

    from super_resolution_tpu.models.swinir_arch import SwinIR

    kw = dict(img_size=64, embed_dim=180, depths=(6,) * 6,
              num_heads=(6,) * 6, window_size=8, mlp_ratio=2.0, upscale=4,
              upsampler="pixelshuffle", resi_connection="1conv")
    ref_arch = get_swinir_arch()
    torch.manual_seed(2)
    tm = ref_arch.SwinIR(**kw)
    tm.eval()
    fm = SwinIR(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])

    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-3)
