"""Flash-accumulator large-window MSA (ops/pallas_attention.py r4 tail).

Parity of msa_flash_attention (online-softmax kv chunking, per-window-row
accumulator scratch) against the XLA window-MSA oracle — the r3-verdict
ask-8 experiment targeting ESC-XL's native ws 48 (ref dep:
hat/archs/esc_arch.py:310-316, FlexAttention at large window sizes).
Interpret mode on CPU; the hardware A/B lives in scripts/bench_esc.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from super_resolution_tpu.ops.pallas_attention import (
    _flash_chunk_rows, msa_flash_attention, msa_flash_supported,
    msa_qtile_reference)


@pytest.mark.parametrize("ws,chunk_rows,heads", [
    (8, 2, 2),    # 4 kv chunks — exercises the online accumulation
    (8, 8, 2),    # single chunk — init + finalize in one pass
    (16, 4, 4),   # larger window, 4 chunks
])
def test_flash_msa_parity(ws, chunk_rows, heads):
    rng = np.random.default_rng(0)
    b, c = 2, 8 * heads
    h = w = 2 * ws                      # 2x2 windows -> row-sweep scratch
    qkv = jnp.asarray(rng.standard_normal((b, h, w, 3 * c)) * 0.5,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.1,
                       jnp.float32)
    scale = (c // heads) ** -0.5
    ref = msa_qtile_reference(qkv, bias, heads, ws, scale)
    got = msa_flash_attention(qkv, bias, heads=heads, window_size=ws,
                              scale=scale, chunk_rows=chunk_rows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_msa_bf16():
    rng = np.random.default_rng(1)
    ws, heads, c = 8, 2, 16
    qkv = jnp.asarray(rng.standard_normal((1, ws, 2 * ws, 3 * c)) * 0.5,
                      jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.1,
                       jnp.float32)
    ref = msa_qtile_reference(qkv.astype(jnp.float32), bias, heads, ws,
                              (c // heads) ** -0.5)
    got = msa_flash_attention(qkv, bias, heads=heads, window_size=ws,
                              chunk_rows=2)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), atol=0.05, rtol=0.05)


def test_flash_guards():
    # ws 48 is the target shape: chunking must fit scoped VMEM and the
    # kv-chunk (bias lane dim) must be a 128-multiple for Mosaic
    cr = _flash_chunk_rows(48)
    assert cr >= 1 and 48 % cr == 0
    assert (cr * 48) % 128 == 0
    assert 12 * 48 * 48 * (cr * 48) + 2 * 2 ** 20 <= 13 * 2 ** 20
    assert msa_flash_supported(48, 192, 12)       # ESC-XL: d=16
    assert not msa_flash_supported(48, 100, 12)   # dim % heads != 0


def test_flash_ad_matches_reference_grad():
    from super_resolution_tpu.ops.pallas_attention import \
        msa_flash_attention_ad

    rng = np.random.default_rng(2)
    ws, heads, c = 8, 2, 16
    qkv = jnp.asarray(rng.standard_normal((1, ws, ws, 3 * c)) * 0.5,
                      jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, ws * ws, ws * ws)) * 0.1,
                       jnp.float32)
    scale = (c // heads) ** -0.5

    g1 = jax.grad(lambda a: jnp.sum(
        msa_flash_attention_ad(a, bias, heads, ws, scale) ** 2))(qkv)
    g2 = jax.grad(lambda a: jnp.sum(
        msa_qtile_reference(a, bias, heads, ws, scale) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4,
                               rtol=2e-4)
