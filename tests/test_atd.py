"""Golden parity: ATD vs the reference.

AC-MSA's grouping sorts pixels by similarity argmax with UNSTABLE torch
sort (atd_arch.py:303, stable=False) — group membership at boundaries is
tie-break dependent, so exact parity is only well-defined when
category_size >= n (one group; attention is then permutation-invariant
modulo the final unshuffle). The multi-group path is checked for
shape/finiteness.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.atd_arch import ATD


def _pair(**kw):
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.atd_arch import ATD as RefATD

    torch.manual_seed(0)
    tm = RefATD(**kw)
    tm.eval()
    fm = ATD(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    return tm, fm, {"params": params}


@pytest.mark.slow
@pytest.mark.parametrize("upsampler", ["pixelshuffle", "pixelshuffledirect"])
def test_atd_parity_single_group(rng, upsampler):
    kw = dict(img_size=16, embed_dim=24, depths=[2], num_heads=[2],
              window_size=8, category_size=1024, num_tokens=16,
              reducted_dim=6, convffn_kernel_size=5, mlp_ratio=1.0,
              upscale=2, upsampler=upsampler)
    tm, fm, variables = _pair(**kw)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=5e-4,
                               err_msg=upsampler)


def test_atd_nonmultiple_padding(rng):
    kw = dict(img_size=16, embed_dim=24, depths=[2], num_heads=[2],
              window_size=8, category_size=1024, num_tokens=16,
              reducted_dim=6, convffn_kernel_size=5, mlp_ratio=1.0,
              upscale=2, upsampler="pixelshuffledirect")
    tm, fm, variables = _pair(**kw)
    x = rng.random((1, 13, 11, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=5e-4)


def test_atd_multigroup_runs(rng):
    kw = dict(img_size=16, embed_dim=24, depths=[2], num_heads=[2],
              window_size=8, category_size=64, num_tokens=16,
              reducted_dim=6, convffn_kernel_size=5, mlp_ratio=1.0,
              upscale=2, upsampler="pixelshuffledirect")
    fm = ATD(**kw)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    variables = fm.init(jax.random.PRNGKey(0), x)
    y = fm.apply(variables, x)
    assert y.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_atd_pallas_routing_matches_xla(rng, monkeypatch):
    """ATD forced through the fused MSA megakernel (interpret on CPU)
    matches the XLA windowed path — covers both shifted and unshifted
    layers (depth 2)."""
    from super_resolution_tpu.models.atd_arch import ATD

    kw = dict(img_size=16, embed_dim=24, depths=[2], num_heads=[2],
              window_size=8, category_size=64, num_tokens=16,
              reducted_dim=6, convffn_kernel_size=5, mlp_ratio=1.0,
              upscale=2, upsampler="pixelshuffledirect")
    fm = ATD(**kw)
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    ref = np.asarray(fm.apply(variables, x))
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    got = np.asarray(fm.apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)
