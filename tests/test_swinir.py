"""Golden parity: flax SwinIR vs the vendored reference SwinIR."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.swinir_arch import SwinIR


@pytest.mark.parametrize("upsampler,upscale", [
    ("pixelshuffle", 2), ("pixelshuffledirect", 2), ("nearest+conv", 4),
    ("", 1)])
def test_swinir_parity(rng, upsampler, upscale):
    from reference_oracle import get_swinir_arch
    ref_arch = get_swinir_arch()
    torch.manual_seed(0)
    kw = dict(img_size=32, embed_dim=24, depths=(2, 2), num_heads=(2, 2),
              window_size=8, mlp_ratio=2.0, upscale=upscale,
              upsampler=upsampler)
    tm = ref_arch.SwinIR(**kw)
    tm.eval()
    fm = SwinIR(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])

    x = rng.random((1, 16, 24, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=3e-4, err_msg=upsampler)


def test_swinir_non_window_multiple_input(rng):
    """The arch pads to window multiples internally and crops the output,
    like the reference's check_image_size (esc_arb/models/swinir.py:790-795,
    crop :846) — SwinIR must run standalone under plain SRModel on
    arbitrary sizes."""
    from reference_oracle import get_swinir_arch
    ref_arch = get_swinir_arch()
    torch.manual_seed(2)
    kw = dict(img_size=32, embed_dim=24, depths=(2,), num_heads=(2,),
              window_size=8, mlp_ratio=2.0, upscale=2,
              upsampler="pixelshuffledirect")
    tm = ref_arch.SwinIR(**kw)
    tm.eval()
    fm = SwinIR(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 18, 21, 3), dtype=np.float32)
    # the vendored basicsr SwinIR has no check_image_size; apply the
    # esc_arb variant's pad+crop around it as the oracle
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()
    xt = torch.nn.functional.pad(xt, (0, 24 - 21, 0, 24 - 18), "reflect")
    with torch.no_grad():
        ref = tm(xt)[:, :, :36, :42]
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == (1, 36, 42, 3)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=3e-4)


def test_swinir_3conv_resi(rng):
    from reference_oracle import get_swinir_arch
    ref_arch = get_swinir_arch()
    torch.manual_seed(1)
    kw = dict(img_size=16, embed_dim=24, depths=(2,), num_heads=(2,),
              window_size=8, mlp_ratio=2.0, upscale=2,
              upsampler="pixelshuffledirect", resi_connection="3conv")
    tm = ref_arch.SwinIR(**kw)
    tm.eval()
    fm = SwinIR(**kw)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    x = rng.random((1, 16, 16, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=3e-4)
