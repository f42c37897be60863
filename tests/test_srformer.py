"""Golden parity: flax SRFormer vs the reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.srformer_arch import SRFormer


@pytest.mark.parametrize("upsampler,upscale,size", [
    ("pixelshuffle", 2, (16, 16)),
    ("pixelshuffledirect", 2, (16, 24)),
    ("", 1, (16, 16)),
])
def test_srformer_parity(rng, upsampler, upscale, size):
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.srformer_arch import SRFormer as RefSRFormer

    torch.manual_seed(0)
    kw = dict(img_size=16, embed_dim=32, depths=(2,), num_heads=(2,),
              window_size=8, mlp_ratio=1.0, upscale=upscale,
              upsampler=upsampler)
    tm = RefSRFormer(**kw)
    tm.eval()
    fm = SRFormer(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, *size, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4,
                               err_msg=upsampler)


def test_srformer_shifted_nonmultiple(rng):
    """Shift path + non-window-multiple input (reflect pad) parity."""
    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.srformer_arch import SRFormer as RefSRFormer

    torch.manual_seed(1)
    kw = dict(img_size=16, embed_dim=32, depths=(2, 2), num_heads=(2, 2),
              window_size=8, mlp_ratio=1.0, upscale=2,
              upsampler="pixelshuffledirect")
    tm = RefSRFormer(**kw)
    tm.eval()
    fm = SRFormer(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 13, 19, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-4)
