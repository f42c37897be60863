"""Golden parity: flax ESC vs the reference PyTorch ESC with shared weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.esc_arch import ESC, geo_ensemble


ESC_KW = dict(dim=32, pdim=16, kernel_size=13, n_blocks=2, conv_blocks=2,
              window_size=8, num_heads=4, upscaling_factor=2, exp_ratio=1.25)


@pytest.fixture(scope="module")
def torch_esc():
    from reference_oracle import get_esc_arch
    esc_arch = get_esc_arch()
    torch.manual_seed(0)
    m = esc_arch.ESC(attn_type="Naive", **{**ESC_KW, "exp_ratio": 1.25})
    m.eval()
    return m


def _flax_esc_with_weights(torch_model):
    model = ESC(**ESC_KW)
    x0 = jnp.zeros((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = convert_state_dict(module_state_dict(torch_model),
                                variables["params"])
    return model, {"params": params}


@pytest.mark.slow
def test_esc_forward_parity_batched(torch_esc, rng):
    # reference eval path assumes batch=1 (esc_arch.py:121 reshape); its
    # train path computes the same values with correct batch handling and
    # ESC has no dropout, so train() mode is the batched oracle
    model, variables = _flax_esc_with_weights(torch_esc)
    x = rng.random((2, 24, 24, 3), dtype=np.float32)
    torch_esc.train()
    try:
        with torch.no_grad():
            ref = torch_esc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    finally:
        torch_esc.eval()
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-4)


def test_esc_nonwindow_multiple(torch_esc, rng):
    """Reflect pad-to-window path: input not a multiple of window size."""
    model, variables = _flax_esc_with_weights(torch_esc)
    x = rng.random((1, 21, 19, 3), dtype=np.float32)
    with torch.no_grad():
        ref = torch_esc(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-4)


def test_geo_ensemble_matches_reference(rng):
    from reference_oracle import get_esc_arch
    esc_arch = get_esc_arch()
    k = rng.random((16, 16, 13, 13), dtype=np.float32)
    ours = np.asarray(geo_ensemble(jnp.asarray(k)))
    ref = esc_arch._geo_ensemble(torch.from_numpy(k)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_esc_jit_compiles(torch_esc, rng):
    model, variables = _flax_esc_with_weights(torch_esc)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    y = fwd(variables, x)
    assert y.shape == (1, 32, 32, 3)
