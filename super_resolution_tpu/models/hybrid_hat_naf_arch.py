"""HybridHATNAF — NAFNet stem ahead of HATX (flax.linen, NHWC).

Rebuild of the reference serial hybrid (ref:
hat/archs/hybrid_hat_naf_arch.py): a lightweight NAFNet preprocessing stem
(SimpleGate blocks with scale-channel attention, residual to the input)
followed by HATX for global context and upsampling. The esc_adapter's
ESCConvAttnWrapper (ref: hat/archs/esc_adapter.py:9-41) is the same
computation as models.hat_arch.ESCConvAttn in NHWC (no token adaptor
needed) and is re-exported here for API completeness.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.hat_arch import ESCConvAttn as ESCConvAttnWrapper  # noqa: F401
from super_resolution_tpu.models.hatx_arch import HATX
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def simple_gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


class NAFBlock(nn.Module):
    """Simplified NAFBlock: PW -> DW -> SimpleGate -> SCA -> PW, plus a
    gated FFN branch; learnable beta/gamma residual scales."""

    c: int
    dw_expand: int = 2
    ffn_expand: int = 2

    def setup(self):
        dwc = self.c * self.dw_expand
        ffnc = self.c * self.ffn_expand
        self.pw1 = nn.Conv(dwc, (1, 1), name="pw1")
        self.dw = nn.Conv(dwc, (3, 3), padding=[(1, 1), (1, 1)],
                          feature_group_count=dwc, name="dw")
        self.sca_1 = nn.Conv(dwc // 2, (1, 1), name="sca_1")
        self.pw2 = nn.Conv(self.c, (1, 1), name="pw2")
        self.ffn1 = nn.Conv(ffnc, (1, 1), name="ffn1")
        self.ffn_dw = nn.Conv(ffnc, (3, 3), padding=[(1, 1), (1, 1)],
                              feature_group_count=ffnc, name="ffn_dw")
        self.ffn2 = nn.Conv(self.c, (1, 1), name="ffn2")
        self.beta = self.param("beta", nn.initializers.zeros, (self.c,))
        self.gamma = self.param("gamma", nn.initializers.zeros, (self.c,))

    def __call__(self, x):
        shortcut = x
        y = simple_gate(self.dw(self.pw1(x)))
        y = y * self.sca_1(jnp.mean(y, axis=(1, 2), keepdims=True))
        y = shortcut + self.beta * self.pw2(y)
        z = self.ffn2(simple_gate(self.ffn_dw(self.ffn1(y))))
        return y + self.gamma * z


class NAFStem(nn.Module):
    in_ch: int = 3
    width: int = 64
    n_blocks: int = 4

    def setup(self):
        self.head = nn.Conv(self.width, (3, 3), padding=[(1, 1), (1, 1)],
                            name="head")
        self.body = [NAFBlock(self.width, name=f"body_{i}")
                     for i in range(self.n_blocks)]
        self.tail = nn.Conv(self.in_ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name="tail")

    def __call__(self, x):
        h = self.head(x)
        for blk in self.body:
            h = blk(h)
        return x + self.tail(h)


@ARCH_REGISTRY.register()
class HybridHATNAF(nn.Module):
    naf_width: int = 64
    naf_blocks: int = 4
    window_size: int | None = None
    upscale: int = 2
    in_chans: int = 3
    hat_kwargs: Any = None

    def setup(self):
        hk = dict(self.hat_kwargs or {})
        ws = self.window_size
        if ws is None:
            ws = int(hk.get("window_size", 8))
        hk["window_size"] = int(ws)
        hk.setdefault("upscale", int(self.upscale))
        hk.setdefault("in_chans", int(self.in_chans))
        hk = {k: tuple(v) if isinstance(v, list) else v for k, v in hk.items()}
        self.naf = NAFStem(self.in_chans, self.naf_width, self.naf_blocks,
                           name="naf")
        self.hat = HATX(**hk, name="hat")

    def __call__(self, x, deterministic: bool = True):
        return self.hat(self.naf(x), deterministic=deterministic)
