"""Fused gated-dconv FFN kernel vs the flax module (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.models.hat_arch import GatedDconvFFN
from super_resolution_tpu.ops.pallas_ffn import gated_dconv_ffn


def _params_to_args(params):
    w1 = params["fc1"]["kernel"]
    b1 = params["fc1"]["bias"]
    wd = params["dw"]["kernel"][:, :, 0, :]      # (3,3,1,2M) -> (3,3,2M)
    bd = params["dw"]["bias"]
    w2 = params["fc2"]["kernel"]
    b2 = params["fc2"]["bias"]
    return w1, b1, wd, bd, w2, b2


def test_fused_ffn_matches_module(rng):
    dim = 12
    mod = GatedDconvFFN(dim=dim, mlp_ratio=2.0)
    for (h, w) in [(8, 16), (7, 16), (5, 16)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, dim)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        ref = np.asarray(mod.apply({"params": params}, x))
        got = np.asarray(gated_dconv_ffn(x, *_params_to_args(params),
                                         tile_rows=4, interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"{(h, w)}")


def test_fused_ffn_block_matches_hab_tail(rng):
    """gated_dconv_ffn_block == x + FFN(LayerNorm(x)) (the HAB mlp
    residual), including gradient via the custom_vjp XLA backward."""
    from flax import linen as nn

    from super_resolution_tpu.ops.pallas_ffn import (ffn_block_reference,
                                                     gated_dconv_ffn_block,
                                                     gated_dconv_ffn_block_ad)

    dim = 12
    mod = GatedDconvFFN(dim=dim, mlp_ratio=2.0)
    ln = nn.LayerNorm(epsilon=1e-5)
    for (h, w) in [(8, 16), (7, 16)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, dim)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        lnp = ln.init(jax.random.PRNGKey(1), x)["params"]
        lnp = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape).astype(np.float32)), lnp)
        ref = np.asarray(x + mod.apply({"params": params},
                                       ln.apply({"params": lnp}, x)))
        args = (x, lnp["scale"], lnp["bias"], *_params_to_args(params))
        got = np.asarray(gated_dconv_ffn_block(*args, tile_rows=4,
                                               interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"{(h, w)}")
        np.testing.assert_allclose(np.asarray(ffn_block_reference(*args)),
                                   ref, atol=2e-5)
        g = jax.grad(lambda *a: jnp.sum(gated_dconv_ffn_block_ad(*a) ** 2))(
            *args)
        g_ref = jax.grad(lambda *a: jnp.sum(ffn_block_reference(*a) ** 2))(
            *args)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_hab_routes_fused_block(rng, monkeypatch):
    """HAB with SR_TPU_FFN=fused (interpret mode on CPU) matches the
    default XLA composition."""
    from super_resolution_tpu.models.hat_arch import HAB

    mod = HAB(dim=16, num_heads=2, window_size=8, mlp_ratio=2.0)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_FFN", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_FFN", "fused")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_fused_ffn_bf16(rng):
    dim = 12
    mod = GatedDconvFFN(dim=dim, mlp_ratio=2.0)
    x32 = rng.standard_normal((1, 8, 16, dim)).astype(np.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x32))["params"]
    ref = np.asarray(mod.apply({"params": params}, jnp.asarray(x32)))
    args16 = [a.astype(jnp.bfloat16) for a in _params_to_args(params)]
    got = gated_dconv_ffn(jnp.asarray(x32, jnp.bfloat16), *args16,
                          tile_rows=4, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=0.1)


def test_mlp_block_matches_reference(rng):
    from super_resolution_tpu.ops.pallas_ffn import (mlp_block,
                                                     mlp_block_ad,
                                                     mlp_block_reference)

    c, hid = 18, 36
    gamma = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    w1 = jnp.asarray(rng.standard_normal((c, hid)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((hid,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hid, c)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    for (h, w) in [(8, 16), (7, 16)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
        ref = np.asarray(mlp_block_reference(x, gamma, beta, w1, b1, w2, b2))
        got = np.asarray(mlp_block(x, gamma, beta, w1, b1, w2, b2,
                                   tile_rows=4, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-4, err_msg=f"{(h, w)}")
    g = jax.grad(lambda *a: jnp.sum(mlp_block_ad(*a) ** 2))(
        x, gamma, beta, w1, b1, w2, b2)
    g_ref = jax.grad(lambda *a: jnp.sum(mlp_block_reference(*a) ** 2))(
        x, gamma, beta, w1, b1, w2, b2)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def test_ocab_fused_mlp_tail_matches(rng, monkeypatch):
    from super_resolution_tpu.models.hat_arch import OCAB

    mod = OCAB(dim=24, window_size=16, overlap_ratio=0.5, num_heads=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_FFN", "xla")
    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_FFN", "fused")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_classic_fused_mlp_tail_matches(rng, monkeypatch):
    from super_resolution_tpu.models.hat_classic_arch import (HABClassic,
                                                              OCABClassic)

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
    for mod in [HABClassic(dim=24, num_heads=2, window_size=8,
                           mlp_ratio=2.0, squeeze_factor=6),
                OCABClassic(dim=24, num_heads=2, window_size=8,
                            overlap_ratio=0.5, mlp_ratio=2.0)]:
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("SR_TPU_FFN", "xla")
        monkeypatch.setenv("SR_TPU_ATTN", "xla")
        ref = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.setenv("SR_TPU_FFN", "fused")
        got = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got, ref, atol=2e-5,
                                   err_msg=type(mod).__name__)


def test_mlp_block_sum3_matches_reference(rng):
    """3-way residual fused into the MLP tail: kernel vs unfused oracle,
    including the row-padding path (h not a multiple of tile_rows)."""
    from super_resolution_tpu.ops.pallas_ffn import (mlp_block_sum3,
                                                     mlp_block_sum3_reference)

    for h in (8, 10):
        b, w, c = 2, 12, 16
        s = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        a = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        cv = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        beta = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((2 * c,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        ref = np.asarray(mlp_block_sum3_reference(s, a, cv, gamma, beta, w1,
                                                  b1, w2, b2, 0.01))
        got = np.asarray(mlp_block_sum3(s, a, cv, gamma, beta, w1, b1, w2,
                                        b2, conv_scale=0.01, tile_rows=4))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"h={h}")


def test_classic_hab_sum3_routing_matches_xla(rng, monkeypatch):
    """HABClassic with the residual-fused tail (attn kernel on AND off)
    matches the pure XLA path."""
    from super_resolution_tpu.models.hat_classic_arch import HABClassic

    for ss in [0, 4]:
        mod = HABClassic(dim=24, num_heads=2, window_size=8, shift_size=ss,
                         mlp_ratio=2.0, squeeze_factor=6, conv_scale=0.01)
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("SR_TPU_FFN", "xla")
        monkeypatch.setenv("SR_TPU_ATTN", "xla")
        ref = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.setenv("SR_TPU_FFN", "fused")
        got = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got, ref, atol=2e-5, err_msg=f"ss={ss}")
        monkeypatch.setenv("SR_TPU_ATTN", "pallas")
        got2 = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got2, ref, atol=3e-5, err_msg=f"ss={ss}")
        # whole-block megakernel (opt-in: measured slower on v5e, kept
        # correct behind SR_TPU_HAB_MEGA)
        monkeypatch.setenv("SR_TPU_HAB_MEGA", "1")
        got3 = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.delenv("SR_TPU_HAB_MEGA")
        np.testing.assert_allclose(got3, ref, atol=3e-5, err_msg=f"ss={ss}")


def test_mlp_block_sum3_grad(rng):
    from super_resolution_tpu.ops.pallas_ffn import (mlp_block_sum3_ad,
                                                     mlp_block_sum3_reference)

    b, h, w, c = 1, 8, 8, 8
    args = [jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
            for _ in range(3)]
    args += [jnp.asarray(rng.standard_normal((c,)), jnp.float32)
             for _ in range(2)]
    args += [jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((2 * c,)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32),
             jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)]

    gf = jax.grad(lambda *a: jnp.sum(mlp_block_sum3_ad(*a, 0.01) ** 2),
                  argnums=tuple(range(9)))(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(mlp_block_sum3_reference(*a, 0.01) ** 2),
        argnums=tuple(range(9)))(*args)
    for got, ref in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
