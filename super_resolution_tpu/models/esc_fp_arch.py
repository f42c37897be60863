"""ESCFP — fully-pipelined ESC variant (flax.linen, NHWC).

Rebuild of the reference (ref: hat/archs/esc_fp_arch.py): the 13x13 large
kernel is decomposed into a channel-mixing 1x1 (lk_channel) and a spatial
depthwise 13x13 (lk_spatial); the per-sample dynamic 3x3 kernel is padded
to 13x13 and ADDED to the spatial kernel so one grouped conv does both
(:89-123). Reconstruction adds a bicubic-upsampled input residual (:356).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import gelu_exact
from super_resolution_tpu.models.esc_arch import (ConvFFN, WindowAttentionESC,
                                                  orthogonal_oihw)
from super_resolution_tpu.ops.conv import conv2d_nhwc, dynamic_depthwise_conv
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class DecomposedConvolutionalAttention(nn.Module):
    """lk_channel 1x1 then grouped (dynamic3x3-padded + lk_spatial) conv on
    the first pdim channels (ref: esc_fp_arch.py:89-123)."""

    pdim: int
    kernel_size: int = 13

    def setup(self):
        self.proj_1 = nn.Dense(self.pdim // 4, name="proj_1")
        self.proj_3 = nn.Dense(self.pdim * 9, name="proj_3")

    def __call__(self, x, lk_channel, lk_spatial):
        ks = self.kernel_size
        x1 = x[..., :self.pdim]
        x2 = x[..., self.pdim:]
        g = jnp.mean(x1, axis=(1, 2))
        dk = self.proj_3(gelu_exact(self.proj_1(g)))           # (B, pdim*9)
        dk = dk.reshape(-1, self.pdim, 3, 3).transpose(0, 2, 3, 1)  # (B,3,3,p)
        n_pad = (ks - 3) // 2
        dk = jnp.pad(dk, ((0, 0), (n_pad, n_pad), (n_pad, n_pad), (0, 0)))

        x1 = conv2d_nhwc(x1, lk_channel)                       # 1x1 channel mix
        # lk_spatial: (pdim, 1, ks, ks) OIHW depthwise -> (ks, ks, pdim)
        sp = lk_spatial[:, 0].transpose(1, 2, 0)
        x1 = dynamic_depthwise_conv(x1, dk + sp[None])
        return jnp.concatenate([x1, x2], axis=-1)


class DecomposedConvAttnWrapper(nn.Module):
    dim: int
    pdim: int
    kernel_size: int = 13

    def setup(self):
        self.plk = DecomposedConvolutionalAttention(self.pdim,
                                                    self.kernel_size,
                                                    name="plk")
        self.aggr = nn.Conv(self.dim, (1, 1), name="aggr")

    def __call__(self, x, lk_channel, lk_spatial):
        return self.aggr(self.plk(x, lk_channel, lk_spatial))


class BlockFP(nn.Module):
    """ESC block with decomposed conv attention (ref: esc_fp_arch.py:229-275)."""

    dim: int
    pdim: int
    conv_blocks: int
    kernel_size: int
    window_size: int
    num_heads: int
    exp_ratio: float
    use_pallas_attn: bool = False

    def setup(self):
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, name=name)
        self.ln_proj = ln("ln_proj")
        self.proj = ConvFFN(self.dim, 3, 1.5, name="proj")  # FP uses 1.5
        self.ln_attn = ln("ln_attn")
        self.attn = WindowAttentionESC(self.dim, self.window_size,
                                       self.num_heads,
                                       use_pallas=self.use_pallas_attn,
                                       name="attn")
        self.lns = [ln(f"lns_{i}") for i in range(self.conv_blocks)]
        self.pconvs = [DecomposedConvAttnWrapper(self.dim, self.pdim,
                                                 self.kernel_size,
                                                 name=f"pconvs_{i}")
                       for i in range(self.conv_blocks)]
        self.convffns = [ConvFFN(self.dim, 3, self.exp_ratio,
                                 name=f"convffns_{i}")
                         for i in range(self.conv_blocks)]
        self.ln_out = ln("ln_out")
        self.conv_out = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv_out")

    def __call__(self, x, lk_channel, lk_spatial):
        skip = x
        x = self.proj(self.ln_proj(x))
        x = x + self.attn(self.ln_attn(x))
        for ln, pconv, convffn in zip(self.lns, self.pconvs, self.convffns):
            x = x + pconv(convffn(ln(x)), lk_channel, lk_spatial)
        x = self.conv_out(self.ln_out(x))
        return x + skip


@ARCH_REGISTRY.register()
class ESCFP(nn.Module):
    """ESC-FP network (ref: esc_fp_arch.py:277-356)."""

    dim: int
    pdim: int
    kernel_size: int
    n_blocks: int
    conv_blocks: int
    window_size: int
    num_heads: int
    upscaling_factor: int
    exp_ratio: float = 2.0
    attn_type: str = "xla"

    def setup(self):
        self.lk_channel = self.param(
            "lk_channel", nn.initializers.normal(1.0),
            (self.pdim, self.pdim, 1, 1))
        self.lk_spatial = self.param(
            "lk_spatial", orthogonal_oihw,
            (self.pdim, 1, self.kernel_size, self.kernel_size))
        self.proj = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="proj")
        self.blocks = [
            BlockFP(self.dim, self.pdim, self.conv_blocks, self.kernel_size,
                    self.window_size, self.num_heads, self.exp_ratio,
                    use_pallas_attn=(self.attn_type == "pallas"),
                    name=f"blocks_{i}")
            for i in range(self.n_blocks)
        ]
        self.ln_last = nn.LayerNorm(epsilon=1e-6, name="ln_last")
        self.last = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="last")
        self.to_img = nn.Conv(3 * self.upscaling_factor ** 2, (3, 3),
                              padding=[(1, 1), (1, 1)], name="to_img")

    def __call__(self, x):
        s = self.upscaling_factor
        feat = self.proj(x)
        skip = feat
        for block in self.blocks:
            feat = block(feat, self.lk_channel, self.lk_spatial)
        feat = self.last(self.ln_last(feat)) + skip
        feat = self.to_img(feat)
        up = resize_to(x, x.shape[1] * s, x.shape[2] * s, "bicubic")
        return pixel_shuffle(feat, s) + up
