"""Scoped-VMEM guard for the fused MSA block route.

On-chip, Mosaic's ~16 MB scoped-VMEM stack rejects the megakernel at
large windows / wide dtypes (boundary measured by scripts/bench_arb.py:
ws 32 x C 64 in f32 -> "scoped allocation 18.00M > 16.00M"); the arch
call sites must fall back to the XLA window path instead of failing AOT
compile.
"""
import jax
import jax.numpy as jnp
import numpy as np


def test_supported_truth_table():
    from super_resolution_tpu.ops.pallas_attention import (
        attention_window_supported, msa_block_supported)

    assert msa_block_supported(8, jnp.float32)
    assert msa_block_supported(16, jnp.float32)
    assert msa_block_supported(16, jnp.bfloat16)
    assert msa_block_supported(32, jnp.bfloat16)   # production ESC route
    assert not msa_block_supported(32, jnp.float32)  # measured 18M > 16M
    assert not msa_block_supported(48, jnp.bfloat16)  # 42M f32 scores
    assert not msa_block_supported(48, jnp.float32)
    # attention-only kernels (no qkv/proj matmuls): ws 32 fits even f32,
    # ws 48 (ESC-XL) measured 40.5M > 16M
    assert attention_window_supported(32 * 32)
    assert attention_window_supported(16 * 16, 24 * 24)  # OCAB rect
    assert not attention_window_supported(48 * 48)


def test_f32_ws32_falls_back_and_matches(rng):
    """ESC WindowAttention at ws 32 in f32 must route XLA (guard) and in
    bf16 route the kernel (interpret on CPU) — same module, same params,
    outputs agree to bf16 tolerance."""
    from super_resolution_tpu.models.esc_arch import WindowAttentionESC

    m = WindowAttentionESC(dim=16, window_size=32, num_heads=2,
                           use_pallas=True)
    x32 = jnp.asarray(rng.random((1, 32, 32, 16), dtype=np.float32))
    variables = m.init(jax.random.PRNGKey(0), x32)
    out_f32 = m.apply(variables, x32)            # guard -> XLA path
    out_bf16 = m.apply(variables, x32.astype(jnp.bfloat16))  # kernel path
    assert out_f32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_f32, np.float32),
                               np.asarray(out_bf16, np.float32),
                               atol=0.05, rtol=0.05)
