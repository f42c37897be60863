"""StyleGAN2 generator, bilinear-resampling variant (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/stylegan2_bilinear_arch.py:
11-463): identical to stylegan2_arch but every up/down-sampling is a plain
F.interpolate (no FIR smoothing), which sidesteps the CUDA upfirdn kernel
entirely — on TPU both variants are single XLA ops either way.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.models.stylegan2_arch import (EqualLinear,
                                                        norm_style_code)
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.upfirdn import fused_leaky_relu
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _interp2x(x, mode):
    return resize_to(x, x.shape[1] * 2, x.shape[2] * 2, mode)


def _interp_half(x, mode):
    return resize_to(x, x.shape[1] // 2, x.shape[2] // 2, mode)


class ModulatedConv2dBilinear(nn.Module):
    """(ref: stylegan2_bilinear_arch.py:73-160)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str = None
    eps: float = 1e-8
    interpolation_mode: str = "bilinear"

    def setup(self):
        self.modulation = EqualLinear(self.num_style_feat, self.in_channels,
                                      bias_init_val=1.0, name="modulation")
        self.weight = self.param(
            "weight", lambda k: jax.random.normal(
                k, (1, self.out_channels, self.in_channels,
                    self.kernel_size, self.kernel_size)))

    def __call__(self, x, style):
        scale = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        s = self.modulation(style)
        weight = scale * self.weight * s[:, None, :, None, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(
                jnp.sum(weight ** 2, axis=(2, 3, 4)) + self.eps)
            weight = weight * demod[:, :, None, None, None]

        if self.sample_mode == "upsample":
            x = _interp2x(x, self.interpolation_mode)
        elif self.sample_mode == "downsample":
            x = _interp_half(x, self.interpolation_mode)

        pad = self.kernel_size // 2

        def one(xi, wi):
            return lax.conv_general_dilated(
                xi[None], wi.transpose(2, 3, 1, 0), (1, 1),
                [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jax.vmap(one)(x, weight)


class StyleConvBilinear(nn.Module):
    """(ref: stylegan2_bilinear_arch.py:163-207)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str = None
    interpolation_mode: str = "bilinear"

    def setup(self):
        self.modulated_conv = ModulatedConv2dBilinear(
            self.in_channels, self.out_channels, self.kernel_size,
            self.num_style_feat, self.demodulate, self.sample_mode,
            interpolation_mode=self.interpolation_mode,
            name="modulated_conv")
        self.noise_weight = self.param("weight", nn.initializers.zeros, (1,))
        self.act_bias = self.param("activate.bias", nn.initializers.zeros,
                                   (self.out_channels,))

    def __call__(self, x, style, noise=None):
        out = self.modulated_conv(x, style)
        if noise is None:
            noise = jax.random.normal(self.make_rng("noise"),
                                      out.shape[:3] + (1,), out.dtype)
        out = out + self.noise_weight * noise
        return fused_leaky_relu(out, self.act_bias)


class ToRGBBilinear(nn.Module):
    """(ref: stylegan2_bilinear_arch.py:209-254)."""

    in_channels: int
    num_style_feat: int
    upsample: bool = True
    interpolation_mode: str = "bilinear"

    def setup(self):
        self.modulated_conv = ModulatedConv2dBilinear(
            self.in_channels, 3, 1, self.num_style_feat, demodulate=False,
            interpolation_mode=self.interpolation_mode, name="modulated_conv")
        self.bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))

    def __call__(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = _interp2x(skip, self.interpolation_mode)
            out = out + skip
        return out


@ARCH_REGISTRY.register()
class StyleGAN2GeneratorBilinear(nn.Module):
    """(ref: stylegan2_bilinear_arch.py:274-463)."""

    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01
    narrow: float = 1.0
    interpolation_mode: str = "bilinear"

    def setup(self):
        channels = {
            "4": int(512 * self.narrow), "8": int(512 * self.narrow),
            "16": int(512 * self.narrow), "32": int(512 * self.narrow),
            "64": int(256 * self.channel_multiplier * self.narrow),
            "128": int(128 * self.channel_multiplier * self.narrow),
            "256": int(64 * self.channel_multiplier * self.narrow),
            "512": int(32 * self.channel_multiplier * self.narrow),
            "1024": int(16 * self.channel_multiplier * self.narrow),
        }
        self.channels = channels
        self.style_mlp_layers = [
            EqualLinear(self.num_style_feat, self.num_style_feat,
                        lr_mul=self.lr_mlp, activation="fused_lrelu",
                        name=f"style_mlp.{i + 1}")
            for i in range(self.num_mlp)]
        self.constant = self.param(
            "constant_input.weight",
            lambda k: jax.random.normal(k, (1, channels["4"], 4, 4)))
        self.style_conv1 = StyleConvBilinear(
            channels["4"], channels["4"], 3, self.num_style_feat,
            interpolation_mode=self.interpolation_mode, name="style_conv1")
        self.to_rgb1 = ToRGBBilinear(channels["4"], self.num_style_feat,
                                     upsample=False,
                                     interpolation_mode=self.interpolation_mode,
                                     name="to_rgb1")

        self.log_size = int(math.log(self.out_size, 2))
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.num_latent = self.log_size * 2 - 2

        self.noises = [self.param(
            f"noises.noise{i}",
            lambda k, res=2 ** ((i + 5) // 2): jax.random.normal(
                k, (1, 1, res, res)))
            for i in range(self.num_layers)]

        convs, rgbs = [], []
        in_channels = channels["4"]
        for i in range(3, self.log_size + 1):
            out_channels = channels[f"{2 ** i}"]
            idx = len(convs)
            convs.append(StyleConvBilinear(
                in_channels, out_channels, 3, self.num_style_feat,
                sample_mode="upsample",
                interpolation_mode=self.interpolation_mode,
                name=f"style_convs.{idx}"))
            convs.append(StyleConvBilinear(
                out_channels, out_channels, 3, self.num_style_feat,
                interpolation_mode=self.interpolation_mode,
                name=f"style_convs.{idx + 1}"))
            rgbs.append(ToRGBBilinear(
                out_channels, self.num_style_feat,
                interpolation_mode=self.interpolation_mode,
                name=f"to_rgbs.{len(rgbs)}"))
            in_channels = out_channels
        self.style_convs = convs
        self.to_rgbs = rgbs

    def style_mlp(self, x):
        x = norm_style_code(x)
        for layer in self.style_mlp_layers:
            x = layer(x)
        return x

    def __call__(self, styles, input_is_latent=False, noise=None,
                 randomize_noise=True, truncation=1.0,
                 truncation_latent=None, inject_index=None,
                 return_latents=False):
        if not input_is_latent:
            styles = [self.style_mlp(s) for s in styles]
        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [n.reshape(n.shape[0], n.shape[2], n.shape[3], 1)
                         for n in self.noises]
        if truncation < 1:
            styles = [truncation_latent + truncation * (s - truncation_latent)
                      for s in styles]
        if len(styles) == 1:
            inject_index = self.num_latent
            if styles[0].ndim < 3:
                latent = jnp.repeat(styles[0][:, None], inject_index, axis=1)
            else:
                latent = styles[0]
        elif len(styles) == 2:
            assert inject_index is not None, \
                "pass inject_index explicitly (no RNG inside jit)"
            # where-mask mixing keeps shapes static so inject_index may be a
            # traced scalar (sampled on host per step)
            latent1 = jnp.repeat(styles[0][:, None], self.num_latent, axis=1)
            latent2 = jnp.repeat(styles[1][:, None], self.num_latent, axis=1)
            mask = (jnp.arange(self.num_latent) < inject_index)[None, :, None]
            latent = jnp.where(mask, latent1, latent2)

        b = latent.shape[0]
        out = jnp.tile(self.constant.transpose(0, 2, 3, 1), (b, 1, 1, 1))
        out = self.style_conv1(out, latent[:, 0], noise=noise[0])
        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for conv1, conv2, noise1, noise2, to_rgb in zip(
                self.style_convs[::2], self.style_convs[1::2], noise[1::2],
                noise[2::2], self.to_rgbs):
            out = conv1(out, latent[:, i], noise=noise1)
            out = conv2(out, latent[:, i + 1], noise=noise2)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2

        if return_latents:
            return skip, latent
        return skip, None
