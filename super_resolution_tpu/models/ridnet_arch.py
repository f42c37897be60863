"""RIDNet — Real Image Denoising with Feature Attention (flax, NHWC).

Rebuild of the reference denoiser (ref: basicsr/archs/ridnet_arch.py:8-180):
mean-shift in/out, a head conv, N enhancement-attention modules (merge-and-
run dual-dilation unit + residual blocks + channel attention), a tail conv
and a global input residual. All convs are plain XLA convs; dilation rides
``kernel_dilation`` so the MXU sees ordinary 3x3s.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from super_resolution_tpu.models.cnn_archs import ResidualBlockNoBN
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _conv(feats, k=3, dilation=1, padding=None, name=None):
    if padding is None:
        padding = dilation * (k // 2)
    return nn.Conv(feats, (k, k), kernel_dilation=(dilation, dilation),
                   padding=[(padding, padding)] * 2, name=name)


class MeanShift(nn.Module):
    """1x1 conv initialized to (x - sign*mean)/std (ref: ridnet_arch.py:8-28).

    A real (trainable) conv in the reference, so it is one here too; the
    deterministic init reproduces the reference construction.
    """

    rgb_range: float
    rgb_mean: Sequence[float]
    rgb_std: Sequence[float]
    sign: int = -1

    @nn.compact
    def __call__(self, x):
        std = np.asarray(self.rgb_std, np.float32)

        def w_init(_key, _shape=None):
            return jnp.asarray((np.eye(3) / std[:, None]).reshape(3, 3, 1, 1)
                               .transpose(2, 3, 1, 0))  # OIHW -> HWIO

        def b_init(_key, _shape=None):
            return jnp.asarray(self.sign * self.rgb_range
                               * np.asarray(self.rgb_mean, np.float32) / std)

        w = self.param("kernel", w_init)
        b = self.param("bias", b_init)
        return jnp.einsum("bhwi,xyio->bhwo", x, w) + b


class EResidualBlockNoBN(nn.Module):
    """conv-relu-conv-relu-conv1x1 + relu(out+x) (ref: ridnet_arch.py:31-52)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_conv(self.out_channels, name="body_0")(x))
        y = nn.relu(_conv(self.out_channels, name="body_2")(y))
        y = _conv(self.out_channels, k=1, name="body_4")(y)
        return nn.relu(y + x)


class MergeRun(nn.Module):
    """Dual-dilation merge-and-run unit (ref: ridnet_arch.py:55-84)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        d1 = nn.relu(_conv(self.out_channels, name="dilation1_0")(x))
        d1 = nn.relu(_conv(self.out_channels, dilation=2, name="dilation1_2")(d1))
        d2 = nn.relu(_conv(self.out_channels, dilation=3, name="dilation2_0")(x))
        d2 = nn.relu(_conv(self.out_channels, dilation=4, name="dilation2_2")(d2))
        out = jnp.concatenate([d1, d2], axis=-1)
        out = nn.relu(_conv(self.out_channels, name="aggregation_0")(out))
        return out + x


class ChannelAttention(nn.Module):
    """GAP -> 1x1 squeeze -> relu -> 1x1 expand -> sigmoid gate
    (ref: ridnet_arch.py:87-103)."""

    mid_channels: int
    squeeze_factor: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.relu(_conv(self.mid_channels // self.squeeze_factor, k=1,
                          name="attention_1")(y))
        y = nn.sigmoid(_conv(self.mid_channels, k=1, name="attention_3")(y))
        return x * y


class EAM(nn.Module):
    """Enhancement attention module (ref: ridnet_arch.py:106-134)."""

    mid_channels: int

    @nn.compact
    def __call__(self, x):
        out = MergeRun(self.mid_channels, name="merge")(x)
        out = nn.relu(ResidualBlockNoBN(self.mid_channels, name="block1")(out))
        out = EResidualBlockNoBN(self.mid_channels, name="block2")(out)
        return ChannelAttention(self.mid_channels, name="ca")(out)


@ARCH_REGISTRY.register()
class RIDNet(nn.Module):
    """RIDNet denoiser (ref: basicsr/archs/ridnet_arch.py:137-180)."""

    in_channels: int
    mid_channels: int
    out_channels: int
    num_block: int = 4
    img_range: float = 255.0
    rgb_mean: Sequence[float] = (0.4488, 0.4371, 0.4040)
    rgb_std: Sequence[float] = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std,
                        name="sub_mean")(x)
        res = nn.relu(_conv(self.mid_channels, name="head")(res))
        for i in range(self.num_block):
            res = EAM(self.mid_channels, name=f"body_{i}")(res)
        res = _conv(self.out_channels, name="tail")(res)
        res = MeanShift(self.img_range, self.rgb_mean, self.rgb_std, sign=1,
                        name="add_mean")(res)
        return x + res
