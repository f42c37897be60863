"""Golden parity: HybridHATNAF (NAF stem + HATX) vs the reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.hybrid_hat_naf_arch import HybridHATNAF


def test_hybrid_hat_naf_parity(rng):
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.hybrid_hat_naf_arch import HybridHATNAF as RefHybrid

    torch.manual_seed(0)
    hk = dict(img_size=16, embed_dim=60, depths=[2], num_heads=[6],
              window_size=8, mlp_ratio=2.0, hab_ffn_ratio=2.0, upscale=2,
              upsampler="pixelshuffle")
    tm = RefHybrid(naf_width=16, naf_blocks=2, hat_kwargs=hk)
    tm.eval()
    fm = HybridHATNAF(naf_width=16, naf_blocks=2, hat_kwargs=hk)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)
