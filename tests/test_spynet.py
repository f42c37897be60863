"""Golden parity: SpyNet flow estimator vs the PyTorch reference."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def test_spynet_parity(rng):
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.archs.spynet_arch import SpyNet as RefSpyNet
    from super_resolution_tpu.models.spynet_arch import SpyNet

    torch.manual_seed(0)
    tm = RefSpyNet()
    tm.eval()
    fm = SpyNet()
    ref_img = rng.random((2, 40, 48, 3), dtype=np.float32)
    supp_img = rng.random((2, 40, 48, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(ref_img),
                        jnp.asarray(supp_img))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(ref_img.transpose(0, 3, 1, 2)).contiguous(),
                    torch.from_numpy(supp_img.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(ref_img),
                    jnp.asarray(supp_img))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_spynet_nondivisible_input(rng):
    """Odd sizes exercise the resize-to-32-multiple path and the replicate
    padding in the pyramid."""
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.archs.spynet_arch import SpyNet as RefSpyNet
    from super_resolution_tpu.models.spynet_arch import SpyNet

    torch.manual_seed(1)
    tm = RefSpyNet()
    tm.eval()
    fm = SpyNet()
    ref_img = rng.random((1, 37, 45, 3), dtype=np.float32)
    supp_img = rng.random((1, 37, 45, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(ref_img),
                        jnp.asarray(supp_img))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(ref_img.transpose(0, 3, 1, 2)).contiguous(),
                    torch.from_numpy(supp_img.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(ref_img),
                    jnp.asarray(supp_img))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=1e-4)
