"""Golden parity: ESCReal (nearest+conv and DySample heads), ESCRealM, ESCFP."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _oracle(mod_name):
    from reference_oracle import install_stubs
    install_stubs()
    import importlib

    return importlib.import_module(f"hat.archs.{mod_name}")


def test_grid_sample_matches_torch(rng):
    from super_resolution_tpu.ops.grid_sample import grid_sample_bilinear

    img = rng.random((2, 8, 10, 3), dtype=np.float32)
    grid = (rng.random((2, 6, 7, 2), dtype=np.float32) * 2.4 - 1.2)  # incl OOB
    ours = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid)))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(grid), mode="bilinear", align_corners=False,
        padding_mode="border").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


ESC_REAL_KW = dict(dim=16, pdim=8, kernel_size=5, n_blocks=1, conv_blocks=1,
                   window_size=8, num_heads=2, upscaling_factor=4,
                   exp_ratio=1.0)


@pytest.mark.parametrize("use_dysample", [False, True])
def test_escreal_parity(rng, use_dysample):
    from super_resolution_tpu.models.esc_real_arch import ESCReal

    ref_mod = _oracle("esc_real_arch")
    torch.manual_seed(0)
    tm = ref_mod.ESCReal(attn_type="Naive", use_dysample=use_dysample,
                         **ESC_REAL_KW)
    # the reference eval path hardcodes 13//2 padding (esc_real_arch.py:131);
    # train mode uses the kernel's own size and computes identical values
    tm.train()
    fm = ESCReal(use_dysample=use_dysample, **ESC_REAL_KW)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == (1, 64, 64, 3)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)


@pytest.mark.parametrize("upsampler,scale", [
    ("nearest+conv", 2), ("pixelshuffle", 2), ("pixelshuffledirect", 3),
    ("dysample", 2)])
def test_escrealm_parity(rng, upsampler, scale):
    from super_resolution_tpu.models.esc_real_arch import ESCRealM

    ref_mod = _oracle("esc_real_arch")
    torch.manual_seed(0)
    kw = dict(dim=16, pdim=8, kernel_size=5, n_blocks=1, conv_blocks=1,
              window_size=8, num_heads=2, upscaling_factor=scale,
              exp_ratio=1.0, mid_dim=16, upsampler=upsampler,
              unshuffle_mod=(scale < 3))
    tm = ref_mod.ESCRealM(attn_type="Naive", **kw)
    tm.train()
    fm = ESCRealM(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               err_msg=f"{upsampler} x{scale}")


def test_escfp_parity(rng):
    from super_resolution_tpu.models.esc_fp_arch import ESCFP

    ref_mod = _oracle("esc_fp_arch")
    torch.manual_seed(0)
    kw = dict(dim=16, pdim=8, kernel_size=13, n_blocks=1, conv_blocks=1,
              window_size=8, num_heads=2, upscaling_factor=2, exp_ratio=1.0)
    tm = ref_mod.ESCFP(attn_type="Naive", **kw)
    tm.eval()
    fm = ESCFP(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)
