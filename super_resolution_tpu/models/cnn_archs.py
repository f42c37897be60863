"""Classic CNN SR architectures (flax.linen, NHWC).

Rebuilds of the stock basicsr CNN families the reference vendors:
EDSR (ref: basicsr/archs/edsr_arch.py), MSRResNet (srresnet_arch.py),
RCAN (rcan_arch.py), RRDBNet/ESRGAN (rrdbnet_arch.py), SRVGGNetCompact
(hat/archs/srvgg_arch.py) and the shared ResidualBlockNoBN
(arch_util.py:64).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import UpsamplePixelShuffle
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _conv3(feats, name):
    return nn.Conv(feats, (3, 3), padding=[(1, 1), (1, 1)], name=name)


def _mean_shift(x, rgb_mean, img_range, forward: bool):
    mean = jnp.asarray(rgb_mean, x.dtype)
    if forward:
        return (x - mean) * img_range
    return x / img_range + mean


class PReLU(nn.Module):
    """Per-channel PReLU; param named 'weight' to match torch."""

    num_parameters: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", nn.initializers.constant(self.init),
                       (self.num_parameters,))
        return jnp.where(x >= 0, x, a * x)


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv residual block (ref: arch_util.py:64)."""

    num_feat: int = 64
    res_scale: float = 1.0

    def setup(self):
        self.conv1 = _conv3(self.num_feat, "conv1")
        self.conv2 = _conv3(self.num_feat, "conv2")

    def __call__(self, x):
        return x + self.conv2(nn.relu(self.conv1(x))) * self.res_scale


@ARCH_REGISTRY.register()
class EDSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    def setup(self):
        self.conv_first = _conv3(self.num_feat, "conv_first")
        self.body = [ResidualBlockNoBN(self.num_feat, self.res_scale,
                                       name=f"body_{i}")
                     for i in range(self.num_block)]
        self.conv_after_body = _conv3(self.num_feat, "conv_after_body")
        self.upsample = UpsamplePixelShuffle(self.upscale, self.num_feat,
                                             name="upsample")
        self.conv_last = _conv3(self.num_out_ch, "conv_last")

    def __call__(self, x):
        x = _mean_shift(x, self.rgb_mean, self.img_range, True)
        feat = self.conv_first(x)
        res = feat
        for blk in self.body:
            res = blk(res)
        res = self.conv_after_body(res) + feat
        out = self.conv_last(self.upsample(res))
        return _mean_shift(out, self.rgb_mean, self.img_range, False)


@ARCH_REGISTRY.register()
class MSRResNet(nn.Module):
    """Modified SRResNet (ref: srresnet_arch.py:9-80)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_block: int = 16
    upscale: int = 4

    def setup(self):
        self.conv_first = _conv3(self.num_feat, "conv_first")
        self.body = [ResidualBlockNoBN(self.num_feat, name=f"body_{i}")
                     for i in range(self.num_block)]
        if self.upscale in (2, 3):
            self.upconv1 = _conv3(self.num_feat * self.upscale ** 2, "upconv1")
            self.upconv2 = None
        elif self.upscale == 4:
            self.upconv1 = _conv3(self.num_feat * 4, "upconv1")
            self.upconv2 = _conv3(self.num_feat * 4, "upconv2")
        else:
            raise ValueError(f"upscale {self.upscale}")
        self.conv_hr = _conv3(self.num_feat, "conv_hr")
        self.conv_last = _conv3(self.num_out_ch, "conv_last")

    def __call__(self, x):
        feat = nn.leaky_relu(self.conv_first(x), negative_slope=0.1)
        out = feat
        for blk in self.body:
            out = blk(out)
        if self.upscale == 4:
            out = nn.leaky_relu(pixel_shuffle(self.upconv1(out), 2),
                                negative_slope=0.1)
            out = nn.leaky_relu(pixel_shuffle(self.upconv2(out), 2),
                                negative_slope=0.1)
        else:
            out = nn.leaky_relu(pixel_shuffle(self.upconv1(out), self.upscale),
                                negative_slope=0.1)
        out = self.conv_last(nn.leaky_relu(self.conv_hr(out),
                                           negative_slope=0.1))
        base = resize_to(x, x.shape[1] * self.upscale,
                         x.shape[2] * self.upscale, "bilinear")
        return out + base


class RCANChannelAttention(nn.Module):
    num_feat: int
    squeeze_factor: int = 16

    def setup(self):
        mid = self.num_feat // self.squeeze_factor
        self.attention_1 = nn.Conv(mid, (1, 1), name="attention_1")
        self.attention_3 = nn.Conv(self.num_feat, (1, 1), name="attention_3")

    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = nn.sigmoid(self.attention_3(nn.relu(self.attention_1(y))))
        return x * y


class RCAB(nn.Module):
    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    def setup(self):
        self.rcab_0 = _conv3(self.num_feat, "rcab_0")
        self.rcab_2 = _conv3(self.num_feat, "rcab_2")
        self.rcab_3 = RCANChannelAttention(self.num_feat, self.squeeze_factor,
                                           name="rcab_3")

    def __call__(self, x):
        res = self.rcab_3(self.rcab_2(nn.relu(self.rcab_0(x))))
        return x + res * self.res_scale


class RCANResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0

    def setup(self):
        self.residual_group = [
            RCAB(self.num_feat, self.squeeze_factor, self.res_scale,
                 name=f"residual_group_{i}") for i in range(self.num_block)]
        self.conv = _conv3(self.num_feat, "conv")

    def __call__(self, x):
        res = x
        for blk in self.residual_group:
            res = blk(res)
        return x + self.conv(res)


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)

    def setup(self):
        self.conv_first = _conv3(self.num_feat, "conv_first")
        self.body = [RCANResidualGroup(self.num_feat, self.num_block,
                                       self.squeeze_factor, self.res_scale,
                                       name=f"body_{i}")
                     for i in range(self.num_group)]
        self.conv_after_body = _conv3(self.num_feat, "conv_after_body")
        self.upsample = UpsamplePixelShuffle(self.upscale, self.num_feat,
                                             name="upsample")
        self.conv_last = _conv3(self.num_out_ch, "conv_last")

    def __call__(self, x):
        x = _mean_shift(x, self.rgb_mean, self.img_range, True)
        feat = self.conv_first(x)
        res = feat
        for blk in self.body:
            res = blk(res)
        res = self.conv_after_body(res) + feat
        out = self.conv_last(self.upsample(res))
        return _mean_shift(out, self.rgb_mean, self.img_range, False)


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32

    def setup(self):
        g = self.num_grow_ch
        self.conv1 = _conv3(g, "conv1")
        self.conv2 = _conv3(g, "conv2")
        self.conv3 = _conv3(g, "conv3")
        self.conv4 = _conv3(g, "conv4")
        self.conv5 = _conv3(self.num_feat, "conv5")

    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        x1 = lrelu(self.conv1(x))
        x2 = lrelu(self.conv2(jnp.concatenate([x, x1], -1)))
        x3 = lrelu(self.conv3(jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu(self.conv4(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = self.conv5(jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32

    def setup(self):
        self.rdb1 = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                       name="rdb1")
        self.rdb2 = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                       name="rdb2")
        self.rdb3 = ResidualDenseBlock(self.num_feat, self.num_grow_ch,
                                       name="rdb3")

    def __call__(self, x):
        return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x


@ARCH_REGISTRY.register()
class RRDBNet(nn.Module):
    """ESRGAN generator; x1/x2 use pixel-unshuffle stems
    (ref: rrdbnet_arch.py:67-125)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32

    def setup(self):
        self.conv_first = _conv3(self.num_feat, "conv_first")
        self.body = [RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")
                     for i in range(self.num_block)]
        self.conv_body = _conv3(self.num_feat, "conv_body")
        self.conv_up1 = _conv3(self.num_feat, "conv_up1")
        self.conv_up2 = _conv3(self.num_feat, "conv_up2")
        self.conv_hr = _conv3(self.num_feat, "conv_hr")
        self.conv_last = _conv3(self.num_out_ch, "conv_last")

    def __call__(self, x):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        feat = self.conv_first(feat)
        body = feat
        for blk in self.body:
            body = blk(body)
        feat = feat + self.conv_body(body)
        feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
        feat = lrelu(self.conv_up1(feat))
        feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
        feat = lrelu(self.conv_up2(feat))
        return self.conv_last(lrelu(self.conv_hr(feat)))


@ARCH_REGISTRY.register()
class SRVGGNetCompact(nn.Module):
    """Compact VGG-style SR net (ref: hat/archs/srvgg_arch.py:7-99)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"

    def setup(self):
        body = [_conv3(self.num_feat, "body_0")]
        idx = 1
        if self.act_type == "prelu":
            body.append(PReLU(self.num_feat, name=f"body_{idx}"))
        else:
            body.append(self.act_type)
        idx += 1
        for _ in range(self.num_conv):
            body.append(_conv3(self.num_feat, f"body_{idx}"))
            idx += 1
            if self.act_type == "prelu":
                body.append(PReLU(self.num_feat, name=f"body_{idx}"))
            else:
                body.append(self.act_type)
            idx += 1
        body.append(_conv3(self.num_out_ch * self.upscale ** 2, f"body_{idx}"))
        self.body = body

    def __call__(self, x):
        out = x
        for layer in self.body:
            if layer == "relu":
                out = nn.relu(out)
            elif layer == "leakyrelu":
                out = nn.leaky_relu(out, negative_slope=0.1)
            elif isinstance(layer, str):
                raise ValueError(f"act {layer}")
            else:
                out = layer(out)
        out = pixel_shuffle(out, self.upscale)
        s = self.upscale
        base = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        return out + base
