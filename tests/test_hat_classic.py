"""Classic HAT component parity vs the SwinIR oracle (the reference vendors
the classic window-MSA pattern in swinir_arch.py; official HAT weights
follow it) plus torch-built oracles for HAT-specific pieces."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from super_resolution_tpu.convert import convert_state_dict, module_state_dict
from super_resolution_tpu.models.hat_classic_arch import (
    CABClassic, HABClassic, HATClassic, OCABClassic, WindowAttentionClassic)
from super_resolution_tpu.ops.windowing import window_partition


def test_window_attention_matches_swinir(rng):
    from reference_oracle import get_swinir_arch
    swinir = get_swinir_arch()
    torch.manual_seed(1)
    tm = swinir.WindowAttention(dim=24, window_size=(8, 8), num_heads=4)
    tm.eval()

    fm = WindowAttentionClassic(dim=24, window_size=8, num_heads=4)
    xw = rng.random((6, 64, 24), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(xw))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(xw)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(xw)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_window_attention_shifted_mask_matches_swinir(rng):
    from reference_oracle import get_swinir_arch
    from super_resolution_tpu.ops.attention import shift_attn_mask
    swinir = get_swinir_arch()
    torch.manual_seed(2)
    tm = swinir.WindowAttention(dim=16, window_size=(4, 4), num_heads=2)
    tm.eval()

    h = w = 8
    mask = shift_attn_mask(h, w, 4, 2)          # (nW, N, N)
    x = rng.random((2, h, w, 16), dtype=np.float32)
    xw = np.asarray(window_partition(jnp.asarray(x), 4)).reshape(-1, 16, 16)

    fm = WindowAttentionClassic(dim=16, window_size=4, num_heads=2)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(xw))
    params = convert_state_dict(module_state_dict(tm), variables["params"])
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(xw),
                               mask=jnp.asarray(mask)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(xw), mask=torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


class _TorchCAB(tnn.Module):
    """Oracle for the classic CAB (paper structure: conv/GELU/conv + squeeze
    channel attention)."""

    def __init__(self, c, compress=3, squeeze=6):
        super().__init__()
        self.cab = tnn.Sequential(
            tnn.Conv2d(c, c // compress, 3, 1, 1), tnn.GELU(),
            tnn.Conv2d(c // compress, c, 3, 1, 1),
            tnn.Sequential(  # ChannelAttention wrapper
                tnn.AdaptiveAvgPool2d(1), tnn.Conv2d(c, c // squeeze, 1),
                tnn.ReLU(inplace=True), tnn.Conv2d(c // squeeze, c, 1),
                tnn.Sigmoid()))

    def forward(self, x):
        y = self.cab[2](self.cab[1](self.cab[0](x)))
        return y * self.cab[3](y)


def test_cab_classic(rng):
    torch.manual_seed(3)
    tm = _TorchCAB(12, compress=3, squeeze=6)
    tm.eval()
    sd = {k.replace("cab.3.1", "cab.3.attention.1")
           .replace("cab.3.3", "cab.3.attention.3"): v
          for k, v in module_state_dict(tm).items()}

    fm = CABClassic(num_feat=12, compress_ratio=3, squeeze_factor=6)
    x = rng.random((2, 10, 11, 12), dtype=np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_state_dict(sd, variables["params"])
    ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=1e-5)


def test_hab_classic_reduces_to_swin_block(rng):
    """With conv_scale=0, a classic HAB equals a SwinTransformerBlock
    (same norm/attn/mlp weights), including the shifted-window path."""
    from reference_oracle import get_swinir_arch
    swinir = get_swinir_arch()
    h = w = 16
    for shift in (0, 4):
        torch.manual_seed(4 + shift)
        tm = swinir.SwinTransformerBlock(
            dim=16, input_resolution=(h, w), num_heads=2, window_size=8,
            shift_size=shift, mlp_ratio=2.0, drop_path=0.0)
        tm.eval()
        sd = module_state_dict(tm)

        fm = HABClassic(dim=16, num_heads=2, window_size=8, shift_size=shift,
                        conv_scale=0.0, mlp_ratio=2.0,
                        compress_ratio=4, squeeze_factor=4)
        x = rng.random((2, h, w, 16), dtype=np.float32)
        variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = convert_state_dict(sd, variables["params"], strict=False)
        ours = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            xt = torch.from_numpy(x.reshape(2, h * w, 16))
            ref = tm(xt, (h, w)).numpy().reshape(2, h, w, 16)
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f"shift={shift}")


def test_hat_classic_end_to_end_shapes(rng):
    model = HATClassic(embed_dim=24, depths=(2,), num_heads=(2,),
                       window_size=8, upscale=4, mlp_ratio=2.0,
                       squeeze_factor=4)
    x = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(variables, x)
    assert y.shape == (1, 64, 64, 3)
    assert bool(jnp.all(jnp.isfinite(y)))
