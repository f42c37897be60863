"""Golden parity: ECBSR (train + folded eval) and RIDNet vs reference."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict


def _basicsr_arch(name):
    from reference_oracle import install_stubs
    install_stubs()
    import importlib

    return importlib.import_module(f"basicsr.archs.{name}")


def _params_from(tm, fm, x):
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    return convert_state_dict(module_state_dict(tm), variables["params"])


@pytest.mark.parametrize("num_in_ch,act,scale",
                         [(3, "prelu", 2), (1, "relu", 4), (3, "rrelu", 3)])
def test_ecbsr_eval_parity(rng, num_in_ch, act, scale):
    from super_resolution_tpu.models.ecbsr_arch import ECBSR

    ref = _basicsr_arch("ecbsr_arch")
    torch.manual_seed(0)
    tm = ref.ECBSR(num_in_ch, num_in_ch, num_block=2, num_channel=8,
                   with_idt=True, act_type=act, scale=scale)
    tm.eval()
    fm = ECBSR(num_in_ch, num_in_ch, num_block=2, num_channel=8,
               with_idt=True, act_type=act, scale=scale)
    x = rng.random((2, 10, 11, num_in_ch), dtype=np.float32)
    params = _params_from(tm, fm, x)
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)


def test_ecbsr_train_path_matches_folded(rng):
    """Training branch-sum must equal the folded eval conv, and both must
    match the reference's training-mode forward."""
    from super_resolution_tpu.models.ecbsr_arch import ECBSR

    ref = _basicsr_arch("ecbsr_arch")
    torch.manual_seed(1)
    tm = ref.ECBSR(3, 3, num_block=1, num_channel=8, with_idt=False,
                   act_type="prelu", scale=2)
    tm.train()
    fm = ECBSR(3, 3, num_block=1, num_channel=8, with_idt=False,
               act_type="prelu", scale=2)
    x = rng.random((1, 9, 9, 3), dtype=np.float32)
    params = _params_from(tm, fm, x)
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    train_out = fm.apply({"params": params}, jnp.asarray(x), training=True)
    eval_out = fm.apply({"params": params}, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(train_out),
                               expect.numpy().transpose(0, 2, 3, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(train_out), np.asarray(eval_out),
                               atol=2e-5)


def test_ridnet_parity(rng):
    from super_resolution_tpu.models.ridnet_arch import RIDNet

    ref = _basicsr_arch("ridnet_arch")
    torch.manual_seed(2)
    tm = ref.RIDNet(3, 16, 3, num_block=2)
    tm.eval()
    fm = RIDNet(3, 16, 3, num_block=2)
    x = rng.random((1, 12, 13, 3), dtype=np.float32)
    params = _params_from(tm, fm, x)
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1), atol=3e-4)
