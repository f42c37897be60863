"""Golden parity: flax fork-HAT vs the reference PyTorch HAT, shared weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.hat_arch import HAT


HAT_KW = dict(img_size=32, embed_dim=60, depths=(2, 2), num_heads=(6, 6),
              window_size=8, compress_ratio=3, squeeze_factor=30,
              conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
              upscale=2, upsampler="pixelshuffle")


def _make_pair(ocab_esc=False, upscale=2, **extra):
    from reference_oracle import get_hat_arch
    hat_arch = get_hat_arch()
    torch.manual_seed(0)
    kw = dict(HAT_KW, upscale=upscale, **extra)
    tm = hat_arch.HAT(ocab_esc_enable=ocab_esc, **kw)
    tm.eval()
    fm = HAT(ocab_esc_enable=ocab_esc, **kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    return tm, fm, {"params": params}


@pytest.mark.slow
@pytest.mark.parametrize("upscale", [2, 4])
def test_hat_forward_parity(rng, upscale):
    tm, fm, variables = _make_pair(upscale=upscale)
    x = rng.random((1, 24, 24, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert ours.shape == (1, 24 * upscale, 24 * upscale, 3)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)


def test_hat_ocab_esc_parity(rng):
    tm, fm, variables = _make_pair(ocab_esc=True)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)


def test_hat_scale3(rng):
    tm, fm, variables = _make_pair(upscale=3)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    assert ours.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)


def test_hat_batched(rng):
    # the reference's ESC eval path assumes batch=1 (esc_arch.py:121);
    # train mode computes the same values batched when drop_path=0
    tm, fm, variables = _make_pair(drop_path_rate=0.0)
    x = rng.random((2, 16, 16, 3), dtype=np.float32)
    tm.train()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)
