"""ESCReal / ESCRealM — real-world ESC variants (flax.linen, NHWC).

Rebuild of the reference (ref: hat/archs/esc_real_arch.py): deeper ESC
blocks (always-LayerNorm conv sub-blocks, fixed 13x13 PLK), an extra 7x7
depthwise skip from the input (:460-465), and either a nearest+conv stack
or the DySample content-aware resampler (:312-399) as the upsampler.
ESCRealM (:578-650) generalizes with pixel-unshuffle stem and the
UniUpsample head family.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.esc_arch import (Block, geo_ensemble,
                                                  orthogonal_oihw)
from super_resolution_tpu.ops.grid_sample import grid_sample_bilinear
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class DySample(nn.Module):
    """Learning-to-upsample-by-learning-to-sample resampler
    (ref: esc_real_arch.py:312-399): per-group offset+scope heads predict
    sub-pixel sampling coordinates; output gathers via bilinear grid
    sampling (border padding, align_corners=False)."""

    in_channels: int
    out_ch: int
    scale: int = 2
    groups: int = 4
    end_convolution: bool = True

    def setup(self):
        assert self.in_channels >= self.groups
        assert self.in_channels % self.groups == 0
        out_channels = 2 * self.groups * self.scale ** 2
        self.offset = nn.Conv(out_channels, (1, 1), name="offset")
        # "scope" is reserved in flax modules; param name stays "scope"
        self.scope_conv = nn.Conv(out_channels, (1, 1), use_bias=False, name="scope")
        if self.end_convolution:
            self.end_conv = nn.Conv(self.out_ch, (1, 1), name="end_conv")
        # init_pos buffer (torch channel order: (2, groups*scale^2))
        s = self.scale
        h = (np.arange(-s + 1, s, 2) / (2.0 * s))
        mesh = np.stack(np.meshgrid(h, h, indexing="ij"))  # (2, s, s)
        mesh = mesh.transpose(0, 2, 1)                      # .transpose(1, 2)
        init = np.tile(mesh.reshape(2, 1, s, s), (1, self.groups, 1, 1))
        self._init_pos = init.reshape(-1).astype(np.float32)  # (2*g*s^2,)

    def __call__(self, x):
        b, h, w, cin = x.shape
        s, g = self.scale, self.groups
        offset = (self.offset(x) * nn.sigmoid(self.scope_conv(x)) * 0.5
                  + jnp.asarray(self._init_pos))            # (B,H,W,2*g*s^2)

        # coords: channel 0 block = x (w-coords), channel 1 block = y
        coords_w = jnp.arange(w, dtype=x.dtype) + 0.5
        coords_h = jnp.arange(h, dtype=x.dtype) + 0.5
        base_x = jnp.broadcast_to(coords_w[None, :], (h, w))
        base_y = jnp.broadcast_to(coords_h[:, None], (h, w))

        off = offset.reshape(b, h, w, 2, g * s * s)
        px = (base_x[None, :, :, None] + off[..., 0, :]) / w * 2 - 1
        py = (base_y[None, :, :, None] + off[..., 1, :]) / h * 2 - 1

        # pixel-shuffle the (g*s^2) coordinate maps to (g, s*H, s*W)
        px = pixel_shuffle(px, s)                            # (B, sH, sW, g)
        py = pixel_shuffle(py, s)
        grid = jnp.stack([px, py], axis=-1)                  # (B, sH, sW, g, 2)
        grid = grid.transpose(0, 3, 1, 2, 4).reshape(b * g, s * h, s * w, 2)

        # sample each channel group with its grid
        xg = x.reshape(b, h, w, g, cin // g)
        xg = xg.transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, cin // g)
        out = grid_sample_bilinear(xg, grid)                 # (B*g, sH, sW, c/g)
        out = out.reshape(b, g, s * h, s * w, cin // g)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, s * h, s * w, cin)

        if self.end_convolution:
            out = self.end_conv(out)
        return out


class InputSkip(nn.Module):
    """1x1 -> 7x7 depthwise (reflect pad) -> lrelu -> 1x1 input skip
    (ref: esc_real_arch.py:460-465). Child names mirror the Sequential."""

    dim: int
    prefix_unshuffle: int = 0

    def setup(self):
        d2 = self.dim * 2
        base = 1 if self.prefix_unshuffle else 0
        self.conv_a = nn.Conv(d2, (1, 1), name=f"{base}")
        self.conv_dw = nn.Conv(d2, (7, 7), padding="VALID",
                               feature_group_count=d2, name=f"{base + 1}")
        self.conv_b = nn.Conv(self.dim, (1, 1), name=f"{base + 3}")

    def __call__(self, x):
        if self.prefix_unshuffle:
            x = pixel_unshuffle(x, self.prefix_unshuffle)
        x = self.conv_a(x)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.leaky_relu(self.conv_dw(x), negative_slope=0.2)
        return self.conv_b(x)


class NearestConvHead(nn.Module):
    """UpsamplingNearest2d + conv stack x4 head (ref: esc_real_arch.py
    to_img Sequential: convs at indices 1, 4, 6, 8)."""

    dim: int

    def setup(self):
        self.to_img_1 = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="1")
        self.to_img_4 = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="4")
        self.to_img_6 = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                name="6")
        self.to_img_8 = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)],
                                name="8")

    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.leaky_relu(self.to_img_1(x), negative_slope=0.2)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        x = nn.leaky_relu(self.to_img_4(x), negative_slope=0.2)
        x = nn.leaky_relu(self.to_img_6(x), negative_slope=0.2)
        return self.to_img_8(x)


@ARCH_REGISTRY.register()
class ESCReal(nn.Module):
    """ESC-Real (ref: esc_real_arch.py:403-475). upscaling factor is 4 for
    the nearest+conv head (two x2 stages, reference structure)."""

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
    use_dysample: bool = False

    def setup(self):
        self.plk_filter = self.param(
            "plk_filter", orthogonal_oihw,
            (self.pdim, self.pdim, self.kernel_size, self.kernel_size))
        self.proj = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="proj")
        self.blocks = [
            Block(self.dim, self.pdim, self.conv_blocks, 13,
                  self.window_size, self.num_heads, self.exp_ratio,
                  use_ln=True,
                  use_pallas_attn=(self.attn_type == "pallas"),
                  name=f"blocks_{i}")
            for i in range(self.n_blocks)
        ]
        self.last = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="last")
        self.skip = InputSkip(self.dim, name="skip")
        if self.use_dysample:
            self.to_img = DySample(self.dim, 3, self.upscaling_factor,
                                   groups=4, end_convolution=True,
                                   name="to_img")
        else:
            if self.upscaling_factor != 4:
                raise ValueError("nearest+conv ESCReal head is x4 (reference)")
            self.to_img = NearestConvHead(self.dim, name="to_img")

    def __call__(self, x):
        feat = self.proj(x)
        skip = feat
        plk = geo_ensemble(self.plk_filter)
        for block in self.blocks:
            feat = block(feat, plk)
        feat = self.last(feat) + skip + self.skip(x)
        return self.to_img(feat)


class UniUpsampleHead(nn.Module):
    """UniUpsample head family (ref: esc_real_arch.py:478-576). Child conv
    names use the torch Sequential indices under 'to_img'."""

    upsample: str
    scale: int
    in_dim: int
    out_dim: int = 3
    mid_dim: int = 64
    group: int = 4

    def setup(self):
        import math

        mods = []  # (kind, module_or_factor)
        idx = 0

        def conv(feats, k, name_idx):
            return nn.Conv(feats, (k, k), padding=[(k // 2, k // 2)] * 2,
                           name=f"{name_idx}")

        up, scale = self.upsample, self.scale
        if scale == 1 or up == "conv":
            mods.append(("conv", conv(self.out_dim, 3, idx)))
        elif up == "pixelshuffledirect":
            mods.append(("conv", conv(self.out_dim * scale ** 2, 3, idx)))
            idx += 1
            mods.append(("shuffle", scale))
        elif up == "pixelshuffle":
            mods.append(("conv", conv(self.mid_dim, 3, idx))); idx += 1
            mods.append(("lrelu01", None)); idx += 1
            if (scale & (scale - 1)) == 0:
                for _ in range(int(math.log2(scale))):
                    mods.append(("conv", conv(4 * self.mid_dim, 3, idx))); idx += 1
                    mods.append(("shuffle", 2)); idx += 1
            elif scale == 3:
                mods.append(("conv", conv(9 * self.mid_dim, 3, idx))); idx += 1
                mods.append(("shuffle", 3)); idx += 1
            mods.append(("conv", conv(self.out_dim, 3, idx)))
        elif up == "nearest+conv":
            if (scale & (scale - 1)) == 0:
                for _ in range(int(math.log2(scale))):
                    mods.append(("conv", conv(self.in_dim, 3, idx))); idx += 1
                    mods.append(("nearest2", None)); idx += 1
                    mods.append(("lrelu02", None)); idx += 1
                mods.append(("conv", conv(self.in_dim, 3, idx))); idx += 1
                mods.append(("lrelu02", None)); idx += 1
            elif scale == 3:
                mods.append(("conv", conv(self.in_dim, 3, idx))); idx += 1
                mods.append(("nearest3", None)); idx += 1
                mods.append(("lrelu02", None)); idx += 1
                mods.append(("conv", conv(self.in_dim, 3, idx))); idx += 1
                mods.append(("lrelu02", None)); idx += 1
            mods.append(("conv", conv(self.out_dim, 3, idx)))
        elif up == "dysample":
            if self.mid_dim != self.in_dim:
                mods.append(("conv", conv(self.mid_dim, 3, idx))); idx += 1
                mods.append(("lrelu01", None)); idx += 1
                dys_dim = self.mid_dim
            else:
                dys_dim = self.in_dim
            mods.append(("dysample", DySample(dys_dim, self.out_dim, scale,
                                              self.group,
                                              name=f"{idx}")))
        else:
            raise ValueError(f"Invalid upsampler {up}")
        self.mods = mods

    def __call__(self, x):
        for kind, mod in self.mods:
            if kind == "conv" or kind == "dysample":
                x = mod(x)
            elif kind == "shuffle":
                x = pixel_shuffle(x, mod)
            elif kind == "lrelu01":
                x = nn.leaky_relu(x, negative_slope=0.01)
            elif kind == "lrelu02":
                x = nn.leaky_relu(x, negative_slope=0.2)
            elif kind == "nearest2":
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            elif kind == "nearest3":
                x = jnp.repeat(jnp.repeat(x, 3, axis=1), 3, axis=2)
        return x


@ARCH_REGISTRY.register()
class ESCRealM(nn.Module):
    """Multi-scale ESC-Real with pixel-unshuffle stem + UniUpsample head
    (ref: esc_real_arch.py:578-660)."""

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
    mid_dim: int = 48
    upsampler: str = "nearest+conv"
    unshuffle_mod: bool = True

    def setup(self):
        self.plk_filter = self.param(
            "plk_filter", orthogonal_oihw,
            (self.pdim, self.pdim, self.kernel_size, self.kernel_size))
        up_factor = self.upscaling_factor
        if self.unshuffle_mod and self.upscaling_factor < 3:
            self.unshuffle_factor = 4 // self.upscaling_factor
            up_factor = 4
            self.proj_1 = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                  name="proj_1")
            self.skip = InputSkip(self.dim, prefix_unshuffle=self.unshuffle_factor,
                                  name="skip")
            self.proj_0 = None
        else:
            self.unshuffle_factor = 0
            self.proj_0 = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                  name="proj")
            self.skip = InputSkip(self.dim, name="skip")
        self.blocks = [
            Block(self.dim, self.pdim, self.conv_blocks, 13,
                  self.window_size, self.num_heads, self.exp_ratio,
                  use_ln=True,
                  use_pallas_attn=(self.attn_type == "pallas"),
                  name=f"blocks_{i}")
            for i in range(self.n_blocks)
        ]
        self.last = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            name="last")
        self.to_img = UniUpsampleHead(self.upsampler, up_factor, self.dim, 3,
                                      self.mid_dim, 4, name="to_img")

    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        if self.unshuffle_factor:
            p = self.unshuffle_factor
            pad_h = (p - h % p) % p
            pad_w = (p - w % p) % p
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                            mode="reflect")
            feat = self.proj_1(pixel_unshuffle(x, p))
        else:
            feat = self.proj_0(x)
        skip = feat
        plk = geo_ensemble(self.plk_filter)
        for block in self.blocks:
            feat = block(feat, plk)
        feat = self.last(feat) + skip + self.skip(x)
        out = self.to_img(feat)
        return out[:, :h * self.upscaling_factor, :w * self.upscaling_factor, :]
