"""DUF — Dynamic Upsampling Filters video SR (flax, NDHWC).

Rebuild of the reference (ref: basicsr/archs/duf_arch.py:9-276): 3D dense
blocks over the 7-frame clip, temporal reduction to one frame, then a
per-pixel dynamic 5x5 filter bank (softmax-normalized) applied to the
center frame plus a residual image, pixel-shuffled to the target scale.
The dynamic filtering is an einsum over the 25 shifted neighborhoods —
one fused VPU/MXU contraction instead of the reference's im2col conv +
batched matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import FrozenBatchNorm
from super_resolution_tpu.ops.conv import shifted_neighborhoods
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _conv3d(feats, k, name):
    pad = [(0, 0) if kk == 1 else (kk // 2, kk // 2) for kk in k]
    return nn.Conv(feats, k, padding=pad, name=name)


def _conv3d_temporal_valid(feats, name):
    """3x3x3 conv with padding (0,1,1): valid in time (ref duf padding)."""
    return nn.Conv(feats, (3, 3, 3), padding=[(0, 0), (1, 1), (1, 1)],
                   name=name)


class DenseBlocks(nn.Module):
    """N dense blocks, temporal dimension preserved
    (ref: duf_arch.py:78-131)."""

    num_block: int
    num_feat: int = 64
    num_grow_ch: int = 16
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_block):
            c = self.num_feat + i * self.num_grow_ch
            y = nn.relu(FrozenBatchNorm(c, self.eps,
                                        name=f"dense_blocks.{i}.0")(x))
            y = _conv3d(c, (1, 1, 1), f"dense_blocks.{i}.2")(y)
            y = nn.relu(FrozenBatchNorm(c, self.eps,
                                        name=f"dense_blocks.{i}.3")(y))
            y = _conv3d(self.num_grow_ch, (3, 3, 3),
                        f"dense_blocks.{i}.5")(y)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class DenseBlocksTemporalReduce(nn.Module):
    """3 dense blocks each shrinking T by 2 (ref: duf_arch.py:9-75)."""

    num_feat: int = 64
    num_grow_ch: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        for i in (1, 2, 3):
            c = x.shape[-1]
            y = nn.relu(FrozenBatchNorm(c, self.eps,
                                        name=f"temporal_reduce{i}.0")(x))
            y = _conv3d(c, (1, 1, 1), f"temporal_reduce{i}.2")(y)
            y = nn.relu(FrozenBatchNorm(c, self.eps,
                                        name=f"temporal_reduce{i}.3")(y))
            y = _conv3d_temporal_valid(self.num_grow_ch,
                                       f"temporal_reduce{i}.5")(y)
            x = jnp.concatenate([x[:, 1:-1], y], axis=-1)
        return x


def dynamic_upsampling_filter(x, filters, filter_size=(5, 5)):
    """Apply per-pixel dynamic filters (ref: duf_arch.py:134-178).

    Args:
      x: (B, H, W, 3) center frame.
      filters: (B, H, W, kh*kw, r^2) softmaxed filter bank.
    Returns:
      (B, H, W, 3*r^2) with torch channel order (c-major) for pixel_shuffle.
    """
    k = filter_size[0]
    taps = shifted_neighborhoods(x, k)           # (B,H,W,kk,3)
    out = jnp.einsum("bhwkc,bhwku->bhwcu", taps, filters)
    return out.reshape(out.shape[:3] + (-1,))


@ARCH_REGISTRY.register()
class DUF(nn.Module):
    """DUF (ref: duf_arch.py:181-276). Input (B, 7, H, W, 3) -> upscaled
    center frame (B, H*scale, W*scale, 3)."""

    scale: int = 4
    num_layer: int = 52
    adapt_official_weights: bool = False

    def setup(self):
        self.eps = 1e-3 if self.adapt_official_weights else 1e-5
        if self.num_layer == 16:
            num_block, num_grow_ch = 3, 32
        elif self.num_layer == 28:
            num_block, num_grow_ch = 9, 16
        elif self.num_layer == 52:
            num_block, num_grow_ch = 21, 16
        else:
            raise ValueError(f"num_layer {self.num_layer}")

        self.conv3d1 = _conv3d(64, (1, 3, 3), "conv3d1")
        self.dense_block1 = DenseBlocks(num_block, 64, num_grow_ch, self.eps,
                                        name="dense_block1")
        self.dense_block2 = DenseBlocksTemporalReduce(
            64 + num_grow_ch * num_block, num_grow_ch, self.eps,
            name="dense_block2")
        channels = 64 + num_grow_ch * num_block + num_grow_ch * 3
        self.bn3d2 = FrozenBatchNorm(channels, self.eps, name="bn3d2")
        self.conv3d2 = _conv3d(256, (1, 3, 3), "conv3d2")
        self.conv3d_r1 = _conv3d(256, (1, 1, 1), "conv3d_r1")
        self.conv3d_r2 = _conv3d(3 * self.scale ** 2, (1, 1, 1), "conv3d_r2")
        self.conv3d_f1 = _conv3d(512, (1, 1, 1), "conv3d_f1")
        self.conv3d_f2 = _conv3d(25 * self.scale ** 2, (1, 1, 1), "conv3d_f2")

    def __call__(self, x):
        b, t, h, w, c = x.shape
        x_center = x[:, t // 2]

        x = self.conv3d1(x)
        x = self.dense_block1(x)
        x = self.dense_block2(x)
        x = nn.relu(self.bn3d2(x))
        x = nn.relu(self.conv3d2(x))

        res = self.conv3d_r2(nn.relu(self.conv3d_r1(x)))     # (B,1,H,W,3s^2)
        filt = self.conv3d_f2(nn.relu(self.conv3d_f1(x)))    # (B,1,H,W,25s^2)
        filt = nn.softmax(filt.reshape(b, h, w, 25, self.scale ** 2), axis=3)

        out = dynamic_upsampling_filter(x_center, filt) + res[:, 0]
        return pixel_shuffle(out, self.scale)
