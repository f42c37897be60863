"""Golden parity: HiT-SRF vs the reference (timm stubbed with real impls)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.hitsrf_arch import HiT_SRF


@pytest.mark.parametrize("upsampler", ["pixelshuffledirect", "pixelshuffle"])
def test_hitsrf_parity(rng, upsampler):
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.hitsrf_arch import HiT_SRF as RefHiT

    torch.manual_seed(0)
    kw = dict(img_size=16, embed_dim=20, depths=[3], num_heads=[2],
              base_win_size=[4, 4], mlp_ratio=1.0, upscale=2,
              upsampler=upsampler, hier_win_ratios=[0.5, 1, 2])
    tm = RefHiT(**kw)
    tm.eval()
    fm = HiT_SRF(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               err_msg=upsampler)
