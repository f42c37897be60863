"""Golden parity: flax HATX vs the reference (incl focus bias + top-k)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.hatx_arch import HATX


KW = dict(img_size=32, embed_dim=60, depths=(2,), num_heads=(6,),
          window_size=8, compress_ratio=3, squeeze_factor=30,
          conv_scale=0.01, overlap_ratio=0.5, mlp_ratio=2.0,
          hab_ffn_ratio=2.0, upscale=2, upsampler="pixelshuffle")


def _make_pair(**extra):
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs import hatx_arch
    torch.manual_seed(0)
    kw = dict(KW, **extra)
    tm = hatx_arch.HATX(**kw)
    tm.eval()
    fm = HATX(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    return tm, fm, {"params": params}


@pytest.mark.parametrize("extra", [
    {},
    {"use_focus_bias": True},
    {"ocab_esc_enable": True},
])
def test_hatx_parity(rng, extra):
    tm, fm, variables = _make_pair(**extra)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               err_msg=str(extra))


def test_hatx_topk_parity(rng):
    # use focus bias as the key score so the keep-set is tie-free in practice
    tm, fm, variables = _make_pair(use_focus_bias=True, kv_topk_ratio=0.5)
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)
