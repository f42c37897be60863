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


def test_srformer_pallas_routing_matches_xla(rng, monkeypatch):
    """SRFormer forced through the fused PSA block megakernel (interpret on
    CPU) matches the XLA windowed path — depth 2 covers both the plain and
    the shifted (rectangular-masked) branch; 16x24 covers multi-window."""
    kw = dict(img_size=16, embed_dim=32, depths=(2,), num_heads=(2,),
              window_size=8, mlp_ratio=1.0, upscale=2,
              upsampler="pixelshuffledirect")
    fm = SRFormer(**kw)
    x = jnp.asarray(rng.random((1, 16, 24, 3)), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    ref = np.asarray(fm.apply(variables, x))
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    got = np.asarray(fm.apply(variables, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_srformer_pallas_grad_finite(rng, monkeypatch):
    """The fused PSA route is trainable: custom-VJP backward (XLA
    recompute) produces finite grads matching the XLA path."""
    kw = dict(img_size=8, embed_dim=16, depths=(2,), num_heads=(2,),
              window_size=8, mlp_ratio=1.0, upscale=2,
              upsampler="pixelshuffledirect")
    fm = SRFormer(**kw)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    variables = fm.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.mean(fm.apply({"params": params}, x) ** 2)

    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    g_ref = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    g = jax.grad(loss)(variables["params"])
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
