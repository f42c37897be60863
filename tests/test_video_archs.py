"""Golden parity: BasicVSR / IconVSR / TOFlow / BasicVSR++ / DUF vs the
PyTorch reference (DCN paths run on the naive oracle stub)."""

import pytest
import numpy as np
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _arch(name):
    from reference_oracle import install_stubs
    install_stubs()
    import importlib

    return importlib.import_module(f"basicsr.archs.{name}")


def _convert(tm, fm, *xs):
    variables = fm.init(jax.random.PRNGKey(0), *map(jnp.asarray, xs))
    return convert_state_dict(module_state_dict(tm), variables["params"])


def _run_both(tm, fm, x, video_in=True, atol=3e-4, video_out=True):
    tm.eval()
    params = _convert(tm, fm, x)
    perm_in = (0, 1, 4, 2, 3) if video_in else (0, 3, 1, 2)
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(*perm_in)).contiguous()).numpy()
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    perm_out = (0, 1, 3, 4, 2) if video_out else (0, 2, 3, 1)
    np.testing.assert_allclose(ours, expect.transpose(*perm_out), atol=atol)


def _randomize_conv_offsets(tm, scale=0.02):
    g = torch.Generator().manual_seed(11)
    for name, p in tm.named_parameters():
        if "conv_offset" in name:
            with torch.no_grad():
                p.copy_(torch.randn(p.shape, generator=g) * scale)


def test_basicvsr_parity(rng):
    from super_resolution_tpu.models.basicvsr_arch import BasicVSR

    ref = _arch("basicvsr_arch")
    torch.manual_seed(0)
    tm = ref.BasicVSR(num_feat=8, num_block=1)
    fm = BasicVSR(num_feat=8, num_block=1)
    x = rng.random((1, 3, 64, 64, 3), dtype=np.float32)
    _run_both(tm, fm, x)


@pytest.mark.slow
def test_iconvsr_parity(rng):
    from super_resolution_tpu.models.basicvsr_arch import IconVSR

    ref = _arch("basicvsr_arch")
    torch.manual_seed(1)
    tm = ref.IconVSR(num_feat=8, num_block=1, keyframe_stride=3,
                     temporal_padding=2)
    _randomize_conv_offsets(tm)
    fm = IconVSR(num_feat=8, num_block=1, keyframe_stride=3,
                 temporal_padding=2)
    x = rng.random((1, 5, 64, 64, 3), dtype=np.float32)
    _run_both(tm, fm, x, atol=5e-4)


def test_toflow_parity(rng):
    from super_resolution_tpu.models.tof_arch import TOFlow

    ref = _arch("tof_arch")
    for adapt in (False, True):
        torch.manual_seed(2)
        tm = ref.TOFlow(adapt_official_weights=adapt)
        fm = TOFlow(adapt_official_weights=adapt)
        x = np.random.default_rng(3).random((1, 7, 32, 32, 3),
                                            dtype=np.float32)
        _run_both(tm, fm, x, atol=5e-4, video_out=False)


@pytest.mark.slow
def test_basicvsrpp_parity(rng):
    from super_resolution_tpu.models.basicvsrpp_arch import BasicVSRPlusPlus

    ref = _arch("basicvsrpp_arch")
    # reference only builds deform_align when CUDA is available; fake it so
    # the alignment path (the interesting part) is exercised on CPU
    cuda_avail = torch.cuda.is_available
    torch.cuda.is_available = lambda: True
    try:
        torch.manual_seed(3)
        tm = ref.BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    finally:
        torch.cuda.is_available = cuda_avail
    _randomize_conv_offsets(tm)
    fm = BasicVSRPlusPlus(mid_channels=8, num_blocks=1)
    x = rng.random((1, 4, 64, 64, 3), dtype=np.float32)
    _run_both(tm, fm, x, atol=5e-4)


def test_duf_parity(rng):
    from super_resolution_tpu.models.duf_arch import DUF

    ref = _arch("duf_arch")
    torch.manual_seed(4)
    tm = ref.DUF(scale=2, num_layer=16)
    # BN running stats are fresh (mean 0, var 1) at init; randomize so the
    # frozen-BN conversion is actually exercised
    g = torch.Generator().manual_seed(5)
    for name, buf in tm.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
        if name.endswith("running_var"):
            buf.copy_(1 + 0.2 * torch.rand(buf.shape, generator=g))
    fm = DUF(scale=2, num_layer=16)
    x = rng.random((1, 7, 8, 9, 3), dtype=np.float32)
    _run_both(tm, fm, x, atol=5e-4, video_out=False)
