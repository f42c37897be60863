"""StyleGAN2 generator + discriminator (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/stylegan2_arch.py:12-799).
The CUDA upfirdn2d/fused_act extensions are the XLA ops in ops/upfirdn.py;
the reference's batch-into-groups modulated conv trick (stylegan2_arch.py
:261-277) becomes a vmap of a per-sample conv — XLA batches it back into
one MXU-friendly convolution without the layout gymnastics.

Parameters keep torch layout/names (weight (1,O,I,k,k), noise buffers as
frozen params) so reference checkpoints convert verbatim.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.ops.upfirdn import (fused_leaky_relu,
                                              make_resample_kernel, upfirdn2d)
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def norm_style_code(x):
    """(ref: stylegan2_arch.py:12-23)."""
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=1, keepdims=True) + 1e-8)


def upfirdn_upsample(x, resample_kernel, factor=2):
    """(ref: stylegan2_arch.py:43-66)."""
    kernel = make_resample_kernel(resample_kernel) * factor ** 2
    pad = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, up=factor,
                     pad=((pad + 1) // 2 + factor - 1, pad // 2))


def upfirdn_downsample(x, resample_kernel, factor=2):
    """(ref: stylegan2_arch.py:72-91)."""
    kernel = make_resample_kernel(resample_kernel)
    pad = kernel.shape[0] - factor
    return upfirdn2d(x, kernel, down=factor, pad=((pad + 1) // 2, pad // 2))


def upfirdn_smooth(x, resample_kernel, upsample_factor=1, downsample_factor=1,
                   kernel_size=1):
    """(ref: stylegan2_arch.py:97-127)."""
    kernel = make_resample_kernel(resample_kernel)
    if upsample_factor > 1:
        kernel = kernel * upsample_factor ** 2
        pad = (kernel.shape[0] - upsample_factor) - (kernel_size - 1)
        pads = ((pad + 1) // 2 + upsample_factor - 1, pad // 2 + 1)
    elif downsample_factor > 1:
        pad = (kernel.shape[0] - downsample_factor) + (kernel_size - 1)
        pads = ((pad + 1) // 2, pad // 2)
    else:
        raise NotImplementedError
    return upfirdn2d(x, kernel, pad=pads)


class EqualLinear(nn.Module):
    """Equalized linear (ref: stylegan2_arch.py:134-175). Torch-layout
    weight (O, I) scaled at runtime."""

    in_channels: int
    out_channels: int
    bias: bool = True
    bias_init_val: float = 0.0
    lr_mul: float = 1.0
    activation: str = None

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            lambda k: jax.random.normal(
                k, (self.out_channels, self.in_channels)) / self.lr_mul)
        scale = (1.0 / math.sqrt(self.in_channels)) * self.lr_mul
        b = None
        if self.bias:
            b = self.param("bias",
                           nn.initializers.constant(self.bias_init_val),
                           (self.out_channels,)) * self.lr_mul
        out = x @ (w * scale).T
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, b)
        if b is not None:
            out = out + b
        return out


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (ref: stylegan2_arch.py:182-279)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    eps: float = 1e-8

    def setup(self):
        self.modulation = EqualLinear(self.num_style_feat, self.in_channels,
                                      bias_init_val=1.0, name="modulation")
        self.weight = self.param(
            "weight", lambda k: jax.random.normal(
                k, (1, self.out_channels, self.in_channels,
                    self.kernel_size, self.kernel_size)))

    def __call__(self, x, style):
        b = x.shape[0]
        scale = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        s = self.modulation(style)                       # (b, c_in)
        weight = scale * self.weight * s[:, None, :, None, None]
        if self.demodulate:
            demod = jax.lax.rsqrt(
                jnp.sum(weight ** 2, axis=(2, 3, 4)) + self.eps)
            weight = weight * demod[:, :, None, None, None]

        k = self.kernel_size
        if self.sample_mode == "upsample":
            def one(xi, wi):
                kern = jnp.flip(wi, (-2, -1)).transpose(2, 3, 1, 0)
                return lax.conv_general_dilated(
                    xi[None], kern, (1, 1), [(k - 1, k - 1)] * 2,
                    lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            out = jax.vmap(one)(x, weight)
            return upfirdn_smooth(out, self.resample_kernel, 2, 1, k)
        if self.sample_mode == "downsample":
            x = upfirdn_smooth(x, self.resample_kernel, 1, 2, k)

            def one(xi, wi):
                return lax.conv_general_dilated(
                    xi[None], wi.transpose(2, 3, 1, 0), (2, 2),
                    [(0, 0)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
            return jax.vmap(one)(x, weight)

        pad = k // 2

        def one(xi, wi):
            return lax.conv_general_dilated(
                xi[None], wi.transpose(2, 3, 1, 0), (1, 1),
                [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jax.vmap(one)(x, weight)


class StyleConv(nn.Module):
    """Modulated conv + noise injection + fused activation
    (ref: stylegan2_arch.py:288-333)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    num_style_feat: int
    demodulate: bool = True
    sample_mode: str = None
    resample_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        self.modulated_conv = ModulatedConv2d(
            self.in_channels, self.out_channels, self.kernel_size,
            self.num_style_feat, self.demodulate, self.sample_mode,
            self.resample_kernel, name="modulated_conv")
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


class ToRGB(nn.Module):
    """Features -> RGB skip (ref: stylegan2_arch.py:336-374)."""

    in_channels: int
    num_style_feat: int
    upsample: bool = True
    resample_kernel: Sequence[int] = (1, 3, 3, 1)

    def setup(self):
        self.modulated_conv = ModulatedConv2d(
            self.in_channels, 3, 1, self.num_style_feat, demodulate=False,
            name="modulated_conv")
        self.bias = self.param("bias", nn.initializers.zeros, (1, 1, 1, 3))

    def __call__(self, x, style, skip=None):
        out = self.modulated_conv(x, style) + self.bias
        if skip is not None:
            if self.upsample:
                skip = upfirdn_upsample(skip, self.resample_kernel)
            out = out + skip
        return out


@ARCH_REGISTRY.register()
class StyleGAN2Generator(nn.Module):
    """StyleGAN2 generator (ref: stylegan2_arch.py:394-586).

    forward(styles, ...) follows the reference semantics; random noise uses
    the flax 'noise' rng stream (pass rngs={'noise': key}), stored noise
    lives in the param tree mirroring the reference's buffers.
    """

    out_size: int
    num_style_feat: int = 512
    num_mlp: int = 8
    channel_multiplier: int = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    narrow: float = 1.0

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
        self.style_conv1 = StyleConv(channels["4"], channels["4"], 3,
                                     self.num_style_feat,
                                     resample_kernel=self.resample_kernel,
                                     name="style_conv1")
        self.to_rgb1 = ToRGB(channels["4"], self.num_style_feat,
                             upsample=False,
                             resample_kernel=self.resample_kernel,
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
            convs.append(StyleConv(
                in_channels, out_channels, 3, self.num_style_feat,
                sample_mode="upsample", resample_kernel=self.resample_kernel,
                name=f"style_convs.{idx}"))
            convs.append(StyleConv(
                out_channels, out_channels, 3, self.num_style_feat,
                resample_kernel=self.resample_kernel,
                name=f"style_convs.{idx + 1}"))
            rgbs.append(ToRGB(out_channels, self.num_style_feat,
                              resample_kernel=self.resample_kernel,
                              name=f"to_rgbs.{len(rgbs)}"))
            in_channels = out_channels
        self.style_convs = convs
        self.to_rgbs = rgbs

    def style_mlp(self, x):
        x = norm_style_code(x)
        for layer in self.style_mlp_layers:
            x = layer(x)
        return x

    def get_latent(self, x):
        return self.style_mlp(x)

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


class EqualConv2d(nn.Module):
    """Equalized conv (ref: stylegan2_arch.py:605-644)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    bias_init_val: float = 0.0

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", lambda k: jax.random.normal(
            k, (self.out_channels, self.in_channels, self.kernel_size,
                self.kernel_size)))
        scale = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        out = lax.conv_general_dilated(
            x, (w * scale).transpose(2, 3, 1, 0),
            (self.stride, self.stride), [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias",
                                   nn.initializers.constant(self.bias_init_val),
                                   (self.out_channels,))
        return out


class ConvLayer(nn.Module):
    """[smooth] + equal conv + [activation] with torch Sequential indices
    (ref: stylegan2_arch.py:654-701)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    downsample: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    def setup(self):
        idx = 1 if self.downsample else 0
        self.conv = EqualConv2d(
            self.in_channels, self.out_channels, self.kernel_size,
            stride=2 if self.downsample else 1,
            padding=0 if self.downsample else self.kernel_size // 2,
            use_bias=self.use_bias and not self.activate, name=f"{idx}")
        if self.activate and self.use_bias:
            self.act_bias = self.param(f"{idx + 1}.bias",
                                       nn.initializers.zeros,
                                       (self.out_channels,))

    def __call__(self, x):
        if self.downsample:
            x = upfirdn_smooth(x, self.resample_kernel, 1, 2,
                               self.kernel_size)
        x = self.conv(x)
        if self.activate:
            if self.use_bias:
                x = fused_leaky_relu(x, self.act_bias)
            else:
                x = nn.leaky_relu(x, negative_slope=0.2) * math.sqrt(2)
        return x


class ResBlock(nn.Module):
    """Discriminator residual block (ref: stylegan2_arch.py:704-730)."""

    in_channels: int
    out_channels: int
    resample_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x):
        out = ConvLayer(self.in_channels, self.in_channels, 3,
                        name="conv1")(x)
        out = ConvLayer(self.in_channels, self.out_channels, 3,
                        downsample=True,
                        resample_kernel=self.resample_kernel,
                        name="conv2")(out)
        skip = ConvLayer(self.in_channels, self.out_channels, 1,
                         downsample=True,
                         resample_kernel=self.resample_kernel,
                         use_bias=False, activate=False, name="skip")(x)
        return (out + skip) / math.sqrt(2)


@ARCH_REGISTRY.register()
class StyleGAN2Discriminator(nn.Module):
    """StyleGAN2 discriminator (ref: stylegan2_arch.py:733-799)."""

    out_size: int
    channel_multiplier: int = 2
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    narrow: float = 1.0

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
        log_size = int(math.log(self.out_size, 2))
        body = [ConvLayer(3, channels[f"{self.out_size}"], 1,
                          name="conv_body.0")]
        in_channels = channels[f"{self.out_size}"]
        for n, i in enumerate(range(log_size, 2, -1)):
            out_channels = channels[f"{2 ** (i - 1)}"]
            body.append(ResBlock(in_channels, out_channels,
                                 self.resample_kernel,
                                 name=f"conv_body.{n + 1}"))
            in_channels = out_channels
        self.conv_body = body
        self.final_conv = ConvLayer(in_channels + 1, channels["4"], 3,
                                    name="final_conv")
        self.final_linear0 = EqualLinear(channels["4"] * 4 * 4,
                                         channels["4"],
                                         activation="fused_lrelu",
                                         name="final_linear.0")
        self.final_linear1 = EqualLinear(channels["4"], 1,
                                         name="final_linear.1")

    def __call__(self, x):
        out = x
        for blk in self.conv_body:
            out = blk(out)

        b, h, w, c = out.shape
        group = min(b, self.stddev_group)
        stddev = out.reshape(group, -1, h, w, 1, c)
        stddev = jnp.sqrt(stddev.var(axis=0) + 1e-8)
        stddev = stddev.mean(axis=(1, 2, 4), keepdims=True)[:, :, :, :, 0]
        stddev = jnp.tile(stddev, (group, h, w, 1))
        out = jnp.concatenate([out, stddev], axis=-1)

        out = self.final_conv(out)
        # torch flattens NCHW: (b, c*h*w) with c-major order
        out = out.transpose(0, 3, 1, 2).reshape(b, -1)
        return self.final_linear1(self.final_linear0(out))
