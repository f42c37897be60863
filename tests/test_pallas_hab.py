"""Fused HAB-front kernel vs the flax composition (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_args(rng, c=18, mid=6):
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, mid)).astype(np.float32)
                     * 0.1)
    b1 = jnp.asarray(rng.standard_normal((mid,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((3, 3, mid, c)).astype(np.float32)
                     * 0.1)
    b2 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    return gamma, beta, w1, b1, w2, b2


@pytest.mark.parametrize("hw", [(8, 16), (7, 16), (10, 16)])
def test_hab_front_matches_reference(rng, hw):
    from super_resolution_tpu.ops.pallas_hab import (hab_front,
                                                     hab_front_reference)

    h, w = hw
    c, pdim = 18, 8
    args = _make_args(rng, c=c)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    ref = hab_front_reference(x, *args, pdim=pdim)
    got = hab_front(x, *args, pdim=pdim, tile_rows=4, interpret=True)
    for r, g, name in zip(ref, got, ["ln1", "cab", "gap_cab", "gap16"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-4,
                                   err_msg=f"{name} {hw}")


def test_hab_front_grad_matches(rng):
    from super_resolution_tpu.ops.pallas_hab import (hab_front_ad,
                                                     hab_front_reference)

    c, pdim = 18, 8
    args = _make_args(rng, c=c)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, c)).astype(np.float32))

    def loss_f(fn):
        def f(x_, *a):
            ln1, cab, gc, g16 = fn(x_, *a)
            return (jnp.sum(ln1 ** 2) + jnp.sum(cab ** 2)
                    + jnp.sum(gc ** 2) + jnp.sum(g16 ** 2))
        return f

    g = jax.grad(loss_f(lambda *a: hab_front_ad(*a, 1e-5, pdim)),
                 argnums=(0, 1, 3))(x, *args)
    g_ref = jax.grad(loss_f(lambda *a: hab_front_reference(*a, pdim=pdim)),
                     argnums=(0, 1, 3))(x, *args)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-3)


def test_hab_routes_fused_front(rng, monkeypatch):
    """Full HAB forced through the fused front (interpret on CPU) matches
    the default composition."""
    from super_resolution_tpu.models.hat_arch import HAB

    mod = HAB(dim=24, num_heads=2, window_size=8, mlp_ratio=2.0,
              esc_pdim=16, esc_kernel=5)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_FFN", "xla")
    monkeypatch.setenv("SR_TPU_HAB", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_HAB", "fused")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_ln_split_matches_reference(rng):
    from super_resolution_tpu.ops.pallas_hab import (ln_split,
                                                     ln_split_reference)

    c, pdim = 18, 8
    gamma = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, c)).astype(np.float32))
    ref = ln_split_reference(x, gamma, beta, pdim=pdim)
    got = ln_split(x, gamma, beta, pdim=pdim, tile_rows=8, interpret=True)
    for r, g, name in zip(ref, got, ["ln1", "x1"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5,
                                   err_msg=name)


def test_hab_routes_split_front(rng, monkeypatch):
    """HAB via the LN-split front (interpret on CPU) matches the default
    composition."""
    from super_resolution_tpu.models.hat_arch import HAB

    mod = HAB(dim=24, num_heads=2, window_size=8, mlp_ratio=2.0,
              esc_pdim=16, esc_kernel=13)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_FFN", "xla")
    monkeypatch.setenv("SR_TPU_LNS", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_LNS", "fused")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=2e-5)
