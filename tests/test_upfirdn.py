"""upfirdn2d XLA formulation vs the reference's pure-torch fallback."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from super_resolution_tpu.ops.upfirdn import fused_leaky_relu, upfirdn2d


def _ref_upfirdn2d_native(x, kernel, up, down, pad):
    """The reference's CPU path (upfirdn2d.py:153-159) as test oracle."""
    from reference_oracle import install_stubs
    install_stubs()
    from basicsr.ops.upfirdn2d.upfirdn2d import upfirdn2d as ref_upfirdn2d

    return ref_upfirdn2d(x, kernel, up=up, down=down, pad=pad)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (2, 2)), (2, 2, (1, 1))])
def test_upfirdn2d_matches_reference(rng, up, down, pad):
    x = rng.random((2, 6, 8, 3), dtype=np.float32)
    k = rng.random((4, 4), dtype=np.float32)
    ours = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                                up=up, down=down, pad=pad))
    ref = _ref_upfirdn2d_native(
        torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous(),
        torch.from_numpy(k), up, down, pad)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, err_msg=f"up={up} down={down}")


def test_fused_leaky_relu(rng):
    x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
    b = rng.standard_normal(6, dtype=np.float32)
    ours = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    xt = torch.from_numpy(x) + torch.from_numpy(b)
    ref = torch.nn.functional.leaky_relu(xt, 0.2) * (2 ** 0.5)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)
