"""Golden parity: StyleGAN2 generator (upfirdn + bilinear variants),
StyleGAN2 discriminator, VGG-style discriminator vs the reference."""

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


def _gen_kwargs():
    return dict(out_size=32, num_style_feat=16, num_mlp=2,
                channel_multiplier=2, narrow=1 / 16)


def test_stylegan2_generator_parity(rng):
    from super_resolution_tpu.models.stylegan2_arch import StyleGAN2Generator

    ref = _arch("stylegan2_arch")
    torch.manual_seed(0)
    tm = ref.StyleGAN2Generator(**_gen_kwargs())
    tm.eval()
    fm = StyleGAN2Generator(**_gen_kwargs())
    styles = rng.standard_normal((2, 16), dtype=np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)},
                        [jnp.asarray(styles)], randomize_noise=False)
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect, _ = tm([torch.from_numpy(styles)], randomize_noise=False)
    ours, _ = fm.apply({"params": params}, [jnp.asarray(styles)],
                       randomize_noise=False)
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_stylegan2_generator_bilinear_parity(rng):
    from super_resolution_tpu.models.stylegan2_bilinear_arch import \
        StyleGAN2GeneratorBilinear

    ref = _arch("stylegan2_bilinear_arch")
    torch.manual_seed(1)
    tm = ref.StyleGAN2GeneratorBilinear(**_gen_kwargs())
    tm.eval()
    fm = StyleGAN2GeneratorBilinear(**_gen_kwargs())
    styles = rng.standard_normal((2, 16), dtype=np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)},
                        [jnp.asarray(styles)], randomize_noise=False)
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect, _ = tm([torch.from_numpy(styles)], randomize_noise=False)
    ours, _ = fm.apply({"params": params}, [jnp.asarray(styles)],
                       randomize_noise=False)
    np.testing.assert_allclose(np.asarray(ours),
                               expect.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4)


def test_stylegan2_discriminator_parity(rng):
    from super_resolution_tpu.models.stylegan2_arch import \
        StyleGAN2Discriminator

    ref = _arch("stylegan2_arch")
    torch.manual_seed(2)
    tm = ref.StyleGAN2Discriminator(out_size=32, channel_multiplier=2,
                                    narrow=1 / 16)
    tm.eval()
    fm = StyleGAN2Discriminator(out_size=32, channel_multiplier=2,
                                narrow=1 / 16)
    x = rng.random((4, 32, 32, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expect.numpy(), atol=1e-4)


def test_vgg_style_discriminator_parity(rng):
    from super_resolution_tpu.models.discriminator_arch import \
        VGGStyleDiscriminator

    ref = _arch("discriminator_arch")
    torch.manual_seed(3)
    tm = ref.VGGStyleDiscriminator(num_in_ch=3, num_feat=4)
    g = torch.Generator().manual_seed(4)
    for name, buf in tm.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
        if name.endswith("running_var"):
            buf.copy_(1 + 0.2 * torch.rand(buf.shape, generator=g))
    tm.eval()
    fm = VGGStyleDiscriminator(num_in_ch=3, num_feat=4)
    x = rng.random((2, 128, 128, 3), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    with torch.no_grad():
        expect = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous())
    ours = fm.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), expect.numpy(), atol=2e-4)
