"""Pallas fused window attention vs the XLA reference path (interpret mode
on CPU; the same kernel compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.ops.attention import attention_with_bias, window_msa
from super_resolution_tpu.ops.pallas_attention import (fused_attention,
                                                       window_attention_fused)


@pytest.mark.parametrize("bw,heads,n,d", [(6, 2, 64, 16), (3, 4, 64, 32)])
def test_fused_square_attention_matches_xla(rng, bw, heads, n, d):
    q = jnp.asarray(rng.standard_normal((bw, heads, n, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((bw, heads, n, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((bw, heads, n, d), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, n, n), dtype=np.float32))
    ref = attention_with_bias(q, k, v, bias, scale=d ** -0.5)
    out = fused_attention(q, k, v, bias, block_windows=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_rectangular_attention_matches_xla(rng):
    # OCAB shape: Nq = 8^2 = 64 queries vs Nk = 12^2 = 144 keys
    bw, heads, nq, nk, d = 4, 2, 64, 144, 16
    q = jnp.asarray(rng.standard_normal((bw, heads, nq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((bw, heads, nk, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((bw, heads, nk, d), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, nq, nk), dtype=np.float32))
    ref = attention_with_bias(q, k, v, bias, scale=d ** -0.5)
    out = fused_attention(q, k, v, bias, block_windows=3)  # forces padding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_window_attention_fused_wrapper_matches_window_msa(rng):
    bw, n, c, heads = 5, 64, 48, 4
    qkv = jnp.asarray(rng.standard_normal((3, bw, n, c), dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, n, n), dtype=np.float32))
    ref = window_msa(qkv, heads, bias)
    out = window_attention_fused(qkv, heads, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_esc_with_pallas_backend_matches_xla(rng):
    """Whole ESC net with attn_type='pallas' == 'xla' backend."""
    from super_resolution_tpu.models.esc_arch import ESC

    kw = dict(dim=32, pdim=16, kernel_size=5, n_blocks=1, conv_blocks=1,
              window_size=8, num_heads=4, upscaling_factor=2, exp_ratio=1.0)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    net_x = ESC(attn_type="xla", **kw)
    variables = net_x.init(jax.random.PRNGKey(0), x)
    net_p = ESC(attn_type="pallas", **kw)
    ref = net_x.apply(variables, x)
    out = net_p.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_v3_matches_xla(rng):
    from super_resolution_tpu.ops.pallas_attention import fused_attention_v3

    bw, heads, nq, nk, d = 7, 3, 16, 36, 10
    q = jnp.asarray(rng.standard_normal((bw, heads, nq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, heads, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, heads, nk, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, nq, nk)), jnp.float32)
    ref = np.asarray(attention_with_bias(q, k, v, bias))
    got = np.asarray(fused_attention_v3(q, k, v, bias, block_windows=2))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_ocab_pallas_routing_matches_xla(rng, monkeypatch):
    """OCAB forced through the packed Pallas route (interpret on CPU)
    matches the XLA head-transpose route."""
    from super_resolution_tpu.models.hat_arch import OCAB

    mod = OCAB(dim=24, window_size=16, overlap_ratio=0.5, num_heads=2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_ocab_attention_matches_reference(rng):
    from super_resolution_tpu.ops.pallas_attention import (
        fused_ocab_attention, ocab_attention_reference)

    b, hw, c, heads, ws = 2, 32, 24, 3, 16
    ow = 24
    q = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    kv = jnp.asarray(rng.standard_normal((b, hw, hw, 2 * c)), jnp.float32)
    bias = jnp.asarray(
        rng.standard_normal((heads, ws * ws, ow * ow)) * 0.02, jnp.float32)
    ref = np.asarray(ocab_attention_reference(q, kv, bias, heads, ws, ow))
    got = np.asarray(fused_ocab_attention(q, kv, bias, heads=heads,
                                          window_size=ws, overlap_win=ow))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_msa_attention_matches_reference(rng):
    from super_resolution_tpu.ops.pallas_attention import (
        fused_msa_attention, msa_attention_reference)

    b, hw, c, heads, ws = 2, 16, 12, 3, 8
    n = ws * ws
    qkv = jnp.asarray(rng.standard_normal((b, hw, hw, 3 * c)), jnp.float32)
    bias = jnp.asarray(
        rng.standard_normal((heads, n, n)) * 0.02, jnp.float32)
    for mask in [jnp.zeros((1, n, n), jnp.float32),
                 jnp.asarray(rng.standard_normal(((hw // ws) ** 2, n, n)),
                             jnp.float32)]:
        ref = np.asarray(msa_attention_reference(qkv, bias, mask, heads, ws))
        got = np.asarray(fused_msa_attention(qkv, bias, mask, heads=heads,
                                             window_size=ws))
        np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_msa_block_matches_reference(rng):
    """qkv-proj + attention + out-proj megakernel vs the XLA chain."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_msa_block, msa_block_reference)

    b, hw, c, heads, ws = 2, 16, 12, 3, 8
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    b_qkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1, jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_proj = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02,
                       jnp.float32)
    for mask in [jnp.zeros((1, n, n), jnp.float32),
                 jnp.asarray(rng.standard_normal(((hw // ws) ** 2, n, n)),
                             jnp.float32)]:
        ref = np.asarray(msa_block_reference(x, w_qkv, b_qkv, w_proj,
                                             b_proj, bias, mask, heads, ws))
        for wb in (1, 2):   # window_block=2 amortizes the matmuls
            got = np.asarray(fused_msa_block(x, w_qkv, b_qkv, w_proj,
                                             b_proj, bias, mask,
                                             heads=heads, window_size=ws,
                                             window_block=wb))
            np.testing.assert_allclose(got, ref, atol=3e-5,
                                       err_msg=f"wb={wb}")


def test_fused_msa_block_grad(rng):
    """The _ad wrapper's XLA backward differentiates the same function the
    kernel computes."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_msa_block_ad, msa_block_reference)

    b, hw, c, heads, ws = 1, 8, 8, 2, 4
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    b_qkv = jnp.zeros((3 * c,), jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_proj = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02,
                       jnp.float32)
    mask = jnp.zeros((1, n, n), jnp.float32)
    scale = (c // heads) ** -0.5

    g1 = jax.grad(lambda a, w: jnp.sum(fused_msa_block_ad(
        a, w, b_qkv, w_proj, b_proj, bias, mask, heads, ws, scale) ** 2),
        argnums=(0, 1))(x, w_qkv)
    g2 = jax.grad(lambda a, w: jnp.sum(msa_block_reference(
        a, w, b_qkv, w_proj, b_proj, bias, mask, heads, ws, scale) ** 2),
        argnums=(0, 1))(x, w_qkv)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_fused_ocab_block_matches_reference(rng):
    """LN + q/kv proj + overlap attention + proj + residual megakernel vs
    the XLA chain — including the border-window kv zero-mask semantics."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_ocab_block, ocab_block_reference)

    b, hw, c, heads, ws = 2, 32, 24, 3, 16
    ow = 24
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal((c,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal((c,)), jnp.float32)
    w_q = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_q = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_kv = jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32)
    b_kv = jnp.asarray(rng.standard_normal((2 * c,)) * 0.1, jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_proj = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ow * ow)) * 0.02,
                       jnp.float32)
    ref = np.asarray(ocab_block_reference(x, lns, lnb, w_q, b_q, w_kv, b_kv,
                                          w_proj, b_proj, bias, heads, ws,
                                          ow))
    got = np.asarray(fused_ocab_block(x, lns, lnb, w_q, b_q, w_kv, b_kv,
                                      w_proj, b_proj, bias, heads=heads,
                                      window_size=ws, overlap_win=ow))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_classic_hab_pallas_routing_matches_xla(rng, monkeypatch):
    """HABClassic (shifted + unshifted) forced through the fused MSA route
    (interpret on CPU) matches the XLA windowed path."""
    from super_resolution_tpu.models.hat_classic_arch import HABClassic

    for ss in [0, 4]:
        mod = HABClassic(dim=24, num_heads=2, window_size=8, shift_size=ss,
                         mlp_ratio=2.0, squeeze_factor=6)
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("SR_TPU_ATTN", "xla")
        ref = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.setenv("SR_TPU_ATTN", "pallas")
        got = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got, ref, atol=3e-5, err_msg=f"ss={ss}")


def test_ocab_classic_pallas_routing_matches_xla(rng, monkeypatch):
    from super_resolution_tpu.models.hat_classic_arch import OCABClassic

    mod = OCABClassic(dim=24, num_heads=2, window_size=16,
                      overlap_ratio=0.5, mlp_ratio=2.0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 24)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SR_TPU_ATTN", "xla")
    monkeypatch.setenv("SR_TPU_FFN", "xla")
    ref = np.asarray(mod.apply({"params": params}, x))
    monkeypatch.setenv("SR_TPU_ATTN", "pallas")
    got = np.asarray(mod.apply({"params": params}, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_swinir_block_pallas_routing_matches_xla(rng, monkeypatch):
    from super_resolution_tpu.models.swinir_arch import SwinTransformerBlock

    for ss in [0, 4]:
        mod = SwinTransformerBlock(dim=24, num_heads=2, window_size=8,
                                   shift_size=ss, mlp_ratio=2.0)
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 24)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("SR_TPU_ATTN", "xla")
        monkeypatch.setenv("SR_TPU_FFN", "xla")
        ref = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.setenv("SR_TPU_ATTN", "pallas")
        monkeypatch.setenv("SR_TPU_FFN", "fused")
        got = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got, ref, atol=3e-5, err_msg=f"ss={ss}")


def test_fused_scc_block_matches_reference(rng):
    """HiT-SRF SCC megakernel (base projection + spatial/channel
    correlations + out-proj) vs the XLA chain, square and rectangular
    windows with ratio > 1 and == 1."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_scc_block, scc_block_reference)

    for (wh, ww), (bh, bw), hw in [((8, 8), (4, 4), (16, 16)),
                                   ((4, 4), (4, 4), (8, 8)),
                                   ((8, 4), (4, 4), (16, 8))]:
        b, c, heads = 2, 20, 2
        x = jnp.asarray(rng.standard_normal((b, hw[0], hw[1], c)),
                        jnp.float32)
        ratio = (wh * ww) // (bh * bw)
        sl_w = jnp.asarray(rng.standard_normal((ratio,)) * 0.3, jnp.float32)
        sl_b = jnp.asarray(rng.standard_normal(()), jnp.float32)
        w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
        b_proj = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
        bias = jnp.asarray(
            rng.standard_normal((heads, wh * ww, bh * bw)) * 0.02,
            jnp.float32)
        ref = np.asarray(scc_block_reference(x, sl_w, sl_b, w_proj, b_proj,
                                             bias, heads, (wh, ww), (bh, bw)))
        got = np.asarray(fused_scc_block(x, sl_w, sl_b, w_proj, b_proj,
                                         bias, heads=heads,
                                         window_size=(wh, ww), base=(bh, bw)))
        np.testing.assert_allclose(got, ref, atol=3e-5,
                                   err_msg=f"win={(wh, ww)}")


def test_hitsrf_scc_pallas_routing_matches_xla(rng, monkeypatch):
    """The SCC module forced through the fused route (interpret on CPU)
    matches the XLA windowed path, across hierarchical window sizes."""
    from super_resolution_tpu.models.hitsrf_arch import SCC

    for win in [(4, 4), (8, 8), (16, 16)]:
        mod = SCC(dim=20, base_win_size=(8, 8), window_size=win,
                  num_heads=2)
        x = jnp.asarray(
            rng.standard_normal((1, 16, 16, 20)).astype(np.float32))
        params = mod.init(jax.random.PRNGKey(0), x)["params"]
        monkeypatch.setenv("SR_TPU_ATTN", "xla")
        ref = np.asarray(mod.apply({"params": params}, x))
        monkeypatch.setenv("SR_TPU_ATTN", "pallas")
        got = np.asarray(mod.apply({"params": params}, x))
        np.testing.assert_allclose(got, ref, atol=3e-5, err_msg=f"win={win}")


def test_fused_scc_block_grad(rng):
    """The _ad wrapper's XLA backward differentiates the kernel's math."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_scc_block_ad, scc_block_reference)

    b, hw, c, heads = 1, 8, 8, 2
    wh = ww = 4
    bh = bw = 2
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    ratio = (wh * ww) // (bh * bw)
    sl_w = jnp.asarray(rng.standard_normal((ratio,)) * 0.3, jnp.float32)
    sl_b = jnp.asarray(rng.standard_normal(()), jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_proj = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, wh * ww, bh * bw)) * 0.02,
                       jnp.float32)

    def loss_fused(*a):
        return jnp.sum(fused_scc_block_ad(*a, heads, (wh, ww), (bh, bw)) ** 2)

    def loss_ref(*a):
        return jnp.sum(scc_block_reference(*a, heads, (wh, ww),
                                           (bh, bw)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, sl_w, sl_b, w_proj, b_proj, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, sl_w, sl_b, w_proj, b_proj, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_fused_hab_block_matches_reference(rng):
    """Whole-block megakernel (W-MSA + 3-way residual + MLP tail) vs the
    XLA chain."""
    from super_resolution_tpu.ops.pallas_attention import (
        fused_hab_block, hab_block_reference)

    b, hw, c, heads, ws = 2, 16, 12, 3, 8
    n = ws * ws
    lnx = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    b_qkv = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1, jnp.float32)
    w_proj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b_proj = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 2 * c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((2 * c,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((2 * c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    args = (lnx, x, cv, w_qkv, b_qkv, w_proj, b_proj, bias, gamma, beta,
            w1, b1, w2, b2)
    ref = np.asarray(hab_block_reference(*args, heads, ws,
                                         conv_scale=0.01))
    got = np.asarray(fused_hab_block(*args, heads=heads, window_size=ws,
                                     conv_scale=0.01))
    np.testing.assert_allclose(got, ref, atol=3e-5)

    # grad through the _ad wrapper matches the reference's
    from super_resolution_tpu.ops.pallas_attention import fused_hab_block_ad

    gf = jax.grad(lambda *a: jnp.sum(
        fused_hab_block_ad(*a, heads, ws, None, 0.01) ** 2),
        argnums=(0, 1, 2))(*args)
    gr = jax.grad(lambda *a: jnp.sum(
        hab_block_reference(*a, heads, ws, None, 0.01) ** 2),
        argnums=(0, 1, 2))(*args)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_msa_qtile_matches_reference_and_grad(rng):
    """Q-tiled large-window MSA (the ESC-XL ws-48 route): forward parity
    with the XLA window path and XLA-backward through the _ad wrapper.
    Uses a small ws with a forced tiny tile budget so the q dim really
    splits into multiple programs."""
    from super_resolution_tpu.ops import pallas_attention as pa

    heads, c, ws = 2, 32, 32
    n = ws * ws
    # at ws 32 the default VMEM budget splits each window into >1 q tile,
    # so the multi-program grid path is really exercised
    assert 1 <= pa._qtile_rows(ws) < ws
    qkv = jnp.asarray(rng.standard_normal((1, 32, 64, 3 * c)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.02, jnp.float32)
    scale = (c // heads) ** -0.5

    ref = np.asarray(pa.msa_qtile_reference(qkv, bias, heads, ws, scale))
    got = np.asarray(pa.msa_qtile_attention(qkv, bias, heads=heads,
                                            window_size=ws, scale=scale))
    np.testing.assert_allclose(got, ref, atol=3e-5)

    gf = jax.grad(lambda a, b_: jnp.sum(
        pa.msa_qtile_attention_ad(a, b_, heads, ws, scale) ** 2))(qkv, bias)
    gr = jax.grad(lambda a, b_: jnp.sum(
        pa.msa_qtile_reference(a, b_, heads, ws, scale) ** 2))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4)


def test_esc_large_window_routes_qtile(rng, monkeypatch):
    """An ESC attention module at a window too big for the whole-window
    kernels must route through the q-tiled kernel and match the XLA path."""
    from super_resolution_tpu.models.esc_arch import WindowAttentionESC
    from super_resolution_tpu.ops import pallas_attention as pa

    calls = {}
    orig = pa.msa_qtile_attention

    def spy(*a, **k):
        calls["hit"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pa, "msa_qtile_attention", spy)
    # make every whole-window route unsupported at this ws, and opt in
    # to the (off-by-default) q-tile route
    monkeypatch.setattr(pa, "msa_block_supported", lambda *_: False)
    monkeypatch.setattr(pa, "attention_window_supported", lambda *_: False)
    monkeypatch.setattr(pa, "qtile_route_enabled", lambda: True)

    m_p = WindowAttentionESC(dim=32, window_size=8, num_heads=2,
                             use_pallas=True)
    m_x = WindowAttentionESC(dim=32, window_size=8, num_heads=2,
                             use_pallas=False)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), jnp.float32)
    params = m_x.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(m_x.apply({"params": params}, x))
    got = np.asarray(m_p.apply({"params": params}, x))
    assert calls.get("hit"), "q-tile kernel was not routed"
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_fused_msa_block_shifted_matches_rolled(rng):
    """r5: SW-MSA shift folded into the kernel's window gather
    (fused_msa_block_shifted) is bit-identical to rolling the image and
    running fused_msa_block — including the cyclic boundary windows
    assembled from the wrap strips, degenerate single-window grids, and
    gradients through the _ad wrapper."""
    import jax
    import jax.numpy as jnp

    from super_resolution_tpu.ops.attention import shift_attn_mask_jnp
    from super_resolution_tpu.ops.pallas_attention import (
        fused_msa_block, fused_msa_block_shifted, fused_msa_block_shifted_ad,
        msa_block_reference)

    for (b, h, w, c, heads, ws, ss, wb) in [
            (2, 48, 64, 12, 2, 8, 4, 1),
            (1, 32, 32, 8, 2, 8, 4, 2),
            (2, 64, 48, 16, 4, 16, 8, 1),
            (1, 16, 16, 8, 2, 8, 4, 1),   # single window row/col
            (1, 24, 40, 8, 2, 8, 2, 1),   # ss != ws//2
    ]:
        x = jnp.asarray(rng.random((b, h, w, c)), jnp.float32)
        wqkv = jnp.asarray(rng.normal(0, .1, (c, 3 * c)), jnp.float32)
        bqkv = jnp.asarray(rng.normal(0, .1, (3 * c,)), jnp.float32)
        wproj = jnp.asarray(rng.normal(0, .1, (c, c)), jnp.float32)
        bproj = jnp.asarray(rng.normal(0, .1, (c,)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, .1, (heads, ws * ws, ws * ws)),
                           jnp.float32)
        mask = shift_attn_mask_jnp(h, w, ws, ss).astype(jnp.float32)
        want = fused_msa_block(jnp.roll(x, (-ss, -ss), axis=(1, 2)),
                               wqkv, bqkv, wproj, bproj, bias, mask,
                               heads=heads, window_size=ws,
                               window_block=wb, interpret=True)
        got = fused_msa_block_shifted(
            x, wqkv, bqkv, wproj, bproj, bias, mask, heads=heads,
            window_size=ws, shift=ss, window_block=wb, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # gradient parity through the _ad wrapper vs the rolled XLA reference
    b, h, w, c, heads, ws, ss = 1, 16, 24, 8, 2, 8, 4
    x = jnp.asarray(rng.random((b, h, w, c)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(0, .1, (c, 3 * c)), jnp.float32)
    bqkv = jnp.zeros((3 * c,))
    wproj = jnp.asarray(rng.normal(0, .1, (c, c)), jnp.float32)
    bproj = jnp.zeros((c,))
    bias = jnp.asarray(rng.normal(0, .1, (heads, ws * ws, ws * ws)),
                       jnp.float32)
    mask = shift_attn_mask_jnp(h, w, ws, ss).astype(jnp.float32)
    g1 = jax.grad(lambda a: jnp.sum(fused_msa_block_shifted_ad(
        a, wqkv, bqkv, wproj, bproj, bias, mask, heads, ws, ss,
        None) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(msa_block_reference(
        jnp.roll(a, (-ss, -ss), axis=(1, 2)), wqkv, bqkv, wproj, bproj,
        bias, mask, heads, ws) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
