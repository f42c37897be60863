"""Shared architecture building blocks (flax.linen, NHWC).

TPU-native analog of the reference's arch utilities
(ref: HAT/ESC/basicsr/archs/arch_util.py). Design conventions:

- Everything is NHWC end-to-end. The reference flips between (B,N,C) token
  and (B,C,H,W) image layouts constantly (patch_embed/unembed); in NHWC the
  channel-last LayerNorms and convs both operate natively, so those
  reshapes disappear entirely.
- Submodule names mirror the reference's module tree (`conv_first`,
  `layers.0...` as `layers_0`, sequential index i as `name_i`) so the
  torch->flax weight converter is a mechanical rename
  (see super_resolution_tpu/convert/torch_import.py).
- Conv kernels converted from torch keep OIHW layout in the param tree and
  are transposed at trace time (free at compile); natively-initialized
  flax convs use HWIO. `conv2d_nhwc` handles the former.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle

# exact (erf) GELU — torch nn.GELU default; jax.nn.gelu defaults to tanh approx
def gelu_exact(x):
    import jax

    return jax.nn.gelu(x, approximate=False)


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible defaults (SAME-style int padding)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2 if self.padding is None else self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)


class MeanShift:
    """DIV2K RGB mean shift (ref: hat_arch.py:659-660)."""

    RGB_MEAN = (0.4488, 0.4371, 0.4040)

    @staticmethod
    def normalize(x, img_range: float = 1.0):
        mean = jnp.asarray(MeanShift.RGB_MEAN, dtype=x.dtype)
        return (x - mean) * img_range

    @staticmethod
    def denormalize(x, img_range: float = 1.0):
        mean = jnp.asarray(MeanShift.RGB_MEAN, dtype=x.dtype)
        return x / img_range + mean


class UpsamplePixelShuffle(nn.Module):
    """Sub-pixel upsampler: [conv(C->4C) + shuffle(2)] x log2(s), or x3
    (ref: hat_arch.py:593-605). Submodules named upsample_{2i} to mirror the
    torch nn.Sequential indices (shuffles hold no params)."""

    scale: int
    num_feat: int

    def setup(self):
        if (self.scale & (self.scale - 1)) == 0:
            n = int(math.log2(self.scale))
            self.convs = [nn.Conv(4 * self.num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                                  name=f"{2 * i}") for i in range(n)]
            self.shuffles = [2] * n
        elif self.scale == 3:
            self.convs = [nn.Conv(9 * self.num_feat, (3, 3), padding=[(1, 1), (1, 1)],
                                  name="0")]
            self.shuffles = [3]
        else:
            raise ValueError(f"scale {self.scale} not supported (2^n and 3 only)")

    def __call__(self, x):
        for conv, r in zip(self.convs, self.shuffles):
            x = pixel_shuffle(conv(x), r)
        return x


class MLP(nn.Module):
    """Linear -> GELU -> Linear, names mlp_{0,2} mirroring nn.Sequential."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, name="mlp_0")(x)
        x = gelu_exact(x)
        return nn.Dense(self.out_dim, name="mlp_2")(x)


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth on the batch dim (ref: hat_arch.py:46-54)."""
    if deterministic or rate == 0.0:
        return x
    import jax

    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, dtype=x.dtype))
    return x / keep * mask


def to_2tuple(x) -> tuple:
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class FrozenBatchNorm(nn.Module):
    """Inference-semantics BatchNorm over the channel-last axis.

    The reference's BN-bearing archs (TOFlow, DUF — ref: tof_arch.py:18-27,
    duf_arch.py:30-56) are inference/weight-import targets; running stats
    live as frozen params named exactly like torch buffers so checkpoints
    convert verbatim. (Training them from scratch would need a batch-stats
    variant; the reference never trains these either.)
    """

    num_features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.num_features,))
        b = self.param("bias", nn.initializers.zeros, (self.num_features,))
        mean = jax.lax.stop_gradient(
            self.param("running_mean", nn.initializers.zeros,
                       (self.num_features,)))
        var = jax.lax.stop_gradient(
            self.param("running_var", nn.initializers.ones,
                       (self.num_features,)))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * w + b


class SNConv2d(nn.Module):
    """Spectrally-normalized conv with torch eval semantics.

    torch.nn.utils.spectral_norm stores weight_orig/weight_u/weight_v and at
    eval computes sigma = u . (W_mat v) from the STORED vectors (no power
    iteration). Parameters keep those exact names so SN checkpoints
    (DFDNet, HiFaceGAN) convert verbatim. Training updates of u/v, when
    needed, are the runner's job (one extra power-iteration step on the
    param tree), keeping this module pure.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from super_resolution_tpu.ops.conv import conv2d_nhwc

        k = self.kernel_size
        w = self.param("weight_orig", nn.initializers.normal(0.02),
                       (self.out_channels, self.in_channels, k, k))
        u = self.param("weight_u", nn.initializers.normal(1.0),
                       (self.out_channels,))
        v = self.param("weight_v", nn.initializers.normal(1.0),
                       (self.in_channels * k * k,))
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w.reshape(self.out_channels, -1) @ v)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,)) if self.use_bias else None)
        return conv2d_nhwc(x, w / sigma, bias, stride=self.stride,
                           padding=self.padding, dilation=self.dilation)
