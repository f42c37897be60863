"""Golden parity: EDVR (PCD alignment + TSA fusion over TPU-native DCNv2)
vs the PyTorch reference running on the naive deform-conv oracle."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _ref_edvr():
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.archs import edvr_arch
    return edvr_arch


def _randomize_conv_offsets(tm):
    """DCN offset convs are zero-initialized (plain-conv behavior); give them
    small random weights so parity actually exercises the deformable path."""
    g = torch.Generator().manual_seed(7)
    for name, p in tm.named_parameters():
        if "conv_offset" in name:
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * 0.02)


@pytest.mark.slow
@pytest.mark.parametrize("with_tsa", [True, False])
def test_edvr_parity(rng, with_tsa):
    from super_resolution_tpu.models.edvr_arch import EDVR

    ref = _ref_edvr()
    torch.manual_seed(0)
    tm = ref.EDVR(num_feat=8, num_frame=5, deformable_groups=2,
                  num_extract_block=1, num_reconstruct_block=1,
                  with_tsa=with_tsa)
    _randomize_conv_offsets(tm)
    tm.eval()
    fm = EDVR(num_feat=8, num_frame=5, deformable_groups=2,
              num_extract_block=1, num_reconstruct_block=1, with_tsa=with_tsa)
    x = rng.random((1, 5, 8, 12, 3), dtype=np.float32)  # (B,T,H,W,C)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=3e-4)


@pytest.mark.slow
def test_edvr_predeblur_parity(rng):
    from super_resolution_tpu.models.edvr_arch import EDVR

    ref = _ref_edvr()
    torch.manual_seed(1)
    tm = ref.EDVR(num_feat=8, num_frame=3, deformable_groups=2,
                  num_extract_block=1, num_reconstruct_block=1,
                  with_predeblur=True)
    _randomize_conv_offsets(tm)
    tm.eval()
    fm = EDVR(num_feat=8, num_frame=3, deformable_groups=2,
              num_extract_block=1, num_reconstruct_block=1,
              with_predeblur=True)
    x = rng.random((1, 3, 8, 8, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=3e-4)
