"""Golden parity: EDSR / MSRResNet / RCAN / RRDBNet / SRVGG vs reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _check(tm, fm, x, atol=3e-4):
    tm.eval()
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=atol)


def _basicsr_arch(name):
    from reference_oracle import install_stubs
    install_stubs()
    import importlib

    return importlib.import_module(f"basicsr.archs.{name}")


@pytest.mark.parametrize("upscale", [2, 3, 4])
def test_edsr_parity(rng, upscale):
    from super_resolution_tpu.models.cnn_archs import EDSR

    ref = _basicsr_arch("edsr_arch")
    torch.manual_seed(0)
    tm = ref.EDSR(3, 3, num_feat=16, num_block=2, upscale=upscale)
    fm = EDSR(num_feat=16, num_block=2, upscale=upscale)
    _check(tm, fm, rng.random((1, 12, 14, 3), dtype=np.float32))


@pytest.mark.parametrize("upscale", [2, 4])
def test_msrresnet_parity(rng, upscale):
    from super_resolution_tpu.models.cnn_archs import MSRResNet

    ref = _basicsr_arch("srresnet_arch")
    torch.manual_seed(1)
    tm = ref.MSRResNet(num_feat=16, num_block=2, upscale=upscale)
    fm = MSRResNet(num_feat=16, num_block=2, upscale=upscale)
    _check(tm, fm, rng.random((1, 12, 12, 3), dtype=np.float32))


def test_rcan_parity(rng):
    from super_resolution_tpu.models.cnn_archs import RCAN

    ref = _basicsr_arch("rcan_arch")
    torch.manual_seed(2)
    tm = ref.RCAN(3, 3, num_feat=16, num_group=2, num_block=2,
                  squeeze_factor=4, upscale=2)
    fm = RCAN(num_feat=16, num_group=2, num_block=2, squeeze_factor=4,
              upscale=2)
    _check(tm, fm, rng.random((1, 10, 10, 3), dtype=np.float32))


@pytest.mark.parametrize("scale", [1, 2, 4])
def test_rrdbnet_parity(rng, scale):
    from super_resolution_tpu.models.cnn_archs import RRDBNet

    ref = _basicsr_arch("rrdbnet_arch")
    torch.manual_seed(3)
    tm = ref.RRDBNet(3, 3, scale=scale, num_feat=16, num_block=1,
                     num_grow_ch=8)
    fm = RRDBNet(scale=scale, num_feat=16, num_block=1, num_grow_ch=8)
    _check(tm, fm, rng.random((1, 8, 8, 3), dtype=np.float32))


@pytest.mark.parametrize("act", ["prelu", "leakyrelu"])
def test_srvgg_parity(rng, act):
    from super_resolution_tpu.models.cnn_archs import SRVGGNetCompact

    from reference_oracle import install_stubs
    install_stubs()
    from hat.archs.srvgg_arch import SRVGGNetCompact as RefSRVGG

    torch.manual_seed(4)
    tm = RefSRVGG(num_feat=16, num_conv=2, upscale=2, act_type=act)
    fm = SRVGGNetCompact(num_feat=16, num_conv=2, upscale=2, act_type=act)
    _check(tm, fm, rng.random((1, 9, 11, 3), dtype=np.float32))
