"""Golden parity: HiFaceGAN (generator + multiscale discriminator) and
DFDNet vs the PyTorch reference (spectral norm in eval semantics)."""

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


def _randomize_sn_vectors(tm):
    """spectral_norm initializes u/v randomly but normalizes during power
    iteration; keep them as-is (eval uses stored values)."""
    return tm


@pytest.mark.slow
def test_hifacegan_generator_parity(rng):
    from super_resolution_tpu.models.hifacegan_arch import HiFaceGAN

    ref = _arch("hifacegan_arch")
    torch.manual_seed(0)
    tm = ref.HiFaceGAN(num_feat=4, is_train=True)
    tm.eval()
    fm = HiFaceGAN(num_feat=4, is_train=True)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # the reference constructs but never calls fc / to_rgbs[0..2] (HiFaceGAN
    # overrides encode; only the last to_rgb runs) — flax materializes only
    # used modules, so drop the dead params before the strict convert
    sd = {k: v for k, v in module_state_dict(tm).items()
          if not k.startswith(("fc.", "to_rgbs.0.", "to_rgbs.1.",
                               "to_rgbs.2."))}
    params = convert_state_dict(sd, variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4)


def test_hifacegan_discriminator_parity(rng):
    from super_resolution_tpu.models.hifacegan_arch import \
        HiFaceGANDiscriminator

    ref = _arch("hifacegan_arch")
    torch.manual_seed(1)
    tm = ref.HiFaceGANDiscriminator(num_feat=8, num_d=2, n_layers_d=3)
    tm.eval()
    fm = HiFaceGANDiscriminator(num_feat=8, num_d=2, n_layers_d=3)
    x = rng.random((1, 64, 64, 6), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    assert len(ours) == 2 and len(ours[0]) == len(expect[0])
    for d_ours, d_ref in zip(ours, expect):
        for o, r in zip(d_ours, d_ref):
            np.testing.assert_allclose(np.asarray(o),
                                       r.numpy().transpose(0, 2, 3, 1),
                                       atol=5e-4)


@pytest.mark.slow
def test_dfdnet_parity(rng, tmp_path):
    from super_resolution_tpu.models.dfdnet_arch import DFDNet

    ref = _arch("dfdnet_arch")
    # fake facial-component dictionary (atoms per part per pyramid level)
    channel_sizes = {"256": 128, "128": 256, "64": 512, "32": 512}
    t_dict = {}
    g = torch.Generator().manual_seed(2)
    for f_size, c in channel_sizes.items():
        t_dict[f_size] = {
            part: torch.randn(2, c, 6, 6, generator=g)
            for part in ("left_eye", "right_eye", "nose", "mouth")}
    dict_path = tmp_path / "dict.pth"
    torch.save(t_dict, dict_path)

    torch.manual_seed(3)
    tm = ref.DFDNet(num_feat=64, dict_path=str(dict_path))
    tm.eval()
    fm = DFDNet(num_feat=64)

    x = rng.random((1, 128, 128, 3), dtype=np.float32) * 2 - 1
    locations = [torch.tensor([[16.0, 16.0, 80.0, 80.0]]),
                 torch.tensor([[32.0, 16.0, 96.0, 80.0]]),
                 torch.tensor([[48.0, 48.0, 96.0, 96.0]]),
                 torch.tensor([[32.0, 64.0, 96.0, 112.0]])]

    j_dict = {fs: {p: jnp.asarray(v.numpy().transpose(0, 2, 3, 1))
                   for p, v in parts.items()}
              for fs, parts in t_dict.items()}
    j_locs = [np.asarray(l.numpy()) for l in locations]

    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x), j_locs, j_dict)
    sd = module_state_dict(tm)
    sd = {k.replace(".vgg_net.", "."): v for k, v in sd.items()
          if not k.endswith((".mean", ".std"))}
    params = convert_state_dict(sd, variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous(),
                    locations)
    ours = fm.apply({"params": params}, jnp.asarray(x), j_locs, j_dict)
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3)
