"""DFDNet — Deep Face Dictionary Network (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/dfdnet_arch.py:12-169,
dfdnet_util.py:41-162): VGG-face features are locally replaced by the most
similar entries of a facial-component dictionary (left/right eye, nose,
mouth), then decoded with SFT (spatial feature transform) upsampling.

Part locations and dictionary entry counts are data-dependent, so — like
the reference, which only supports batch 1 — the forward runs eagerly
(outside jit); each dictionary correlation is still one XLA conv on
device. The component dictionary is passed to __call__ as a pytree of
NHWC arrays ({'256': {'left_eye': (N,h,w,C), ...}, ...}); the runner loads
the reference's .pth dictionary via convert/torch_import.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.models.arch_util import SNConv2d
from super_resolution_tpu.models.vgg_arch import VGGFeatureExtractor
from super_resolution_tpu.ops.conv import conv2d_nhwc
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.utils.registry import ARCH_REGISTRY

# plain python constant: a module-level jnp array would initialize the JAX
# backend at import time, pinning the platform before runners can select it
_BLUR_KERNEL = [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]


def _blur(x):
    """3x3 binomial depthwise blur (ref: dfdnet_util.py:41-54)."""
    c = x.shape[-1]
    kern = jnp.asarray(_BLUR_KERNEL, x.dtype) / 16.0
    k = jnp.broadcast_to(kern[None, None], (c, 1, 3, 3))
    return conv2d_nhwc(x, k, padding=1, groups=c)


def calc_mean_std(feat, eps: float = 1e-5):
    """(ref: dfdnet_util.py:57-71) — NHWC, stats over H, W; torch uses the
    UNBIASED variance here."""
    n = feat.shape[1] * feat.shape[2]
    mean = feat.mean(axis=(1, 2), keepdims=True)
    var = feat.var(axis=(1, 2), keepdims=True) * (n / max(n - 1, 1))
    return mean, jnp.sqrt(var + eps)


def adaptive_instance_normalization(content_feat, style_feat):
    """(ref: dfdnet_util.py:74-88)."""
    style_mean, style_std = calc_mean_std(style_feat)
    content_mean, content_std = calc_mean_std(content_feat)
    return ((content_feat - content_mean) / content_std) * style_std \
        + style_mean


class AttentionBlock(nn.Module):
    """SNconv-lrelu-SNconv (ref: dfdnet_util.py:91-94)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = SNConv2d(self.channels, self.channels, 3, padding=1,
                     name="0")(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return SNConv2d(self.channels, self.channels, 3, padding=1,
                        name="2")(x)


class MSDilationBlock(nn.Module):
    """Multi-scale dilation block (ref: dfdnet_util.py:123-147)."""

    in_channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 1, 1, 1)

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(4):
            d = self.dilation[i]
            pad = ((self.kernel_size - 1) // 2) * d
            y = SNConv2d(self.in_channels, self.in_channels,
                         self.kernel_size, padding=pad, dilation=d,
                         name=f"conv_blocks.{i}.0")(x)
            y = nn.leaky_relu(y, negative_slope=0.2)
            y = SNConv2d(self.in_channels, self.in_channels,
                         self.kernel_size, padding=pad, dilation=d,
                         name=f"conv_blocks.{i}.2")(y)
            outs.append(y)
        out = jnp.concatenate(outs, axis=-1)
        out = SNConv2d(self.in_channels * 4, self.in_channels,
                       self.kernel_size,
                       padding=(self.kernel_size - 1) // 2,
                       name="conv_fusion")(out)
        return out + x


class UpResBlock(nn.Module):
    """(ref: dfdnet_util.py:150-162)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    name="body.0")(x)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = nn.Conv(self.channels, (3, 3), padding=[(1, 1)] * 2,
                    name="body.2")(y)
        return x + y


class SFTUpBlock(nn.Module):
    """Spatial feature transform + upsample (ref: dfdnet_arch.py:12-53)."""

    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, x, updated_feat):
        out = _blur(x)
        out = SNConv2d(self.in_channel, self.out_channel, 3, padding=1,
                       name="conv1.1")(out)
        out = nn.leaky_relu(out, negative_slope=0.04)

        scale = SNConv2d(self.in_channel, self.out_channel, 3, padding=1,
                         name="scale_block.0")(updated_feat)
        scale = nn.leaky_relu(scale, negative_slope=0.2)
        scale = SNConv2d(self.out_channel, self.out_channel, 3, padding=1,
                         name="scale_block.2")(scale)
        shift = SNConv2d(self.in_channel, self.out_channel, 3, padding=1,
                         name="shift_block.0")(updated_feat)
        shift = nn.leaky_relu(shift, negative_slope=0.2)
        shift = nn.sigmoid(SNConv2d(self.out_channel, self.out_channel, 3,
                                    padding=1, name="shift_block.2")(shift))
        out = out * scale + shift

        out = resize_to(out, out.shape[1] * 2, out.shape[2] * 2, "bilinear")
        out = SNConv2d(self.out_channel, self.out_channel, 3, padding=1,
                       name="convup.1")(out)
        return nn.leaky_relu(out, negative_slope=0.2)


@ARCH_REGISTRY.register()
class DFDNet(nn.Module):
    """DFDNet (ref: dfdnet_arch.py:56-169). 512x512 faces, batch 1, eager."""

    num_feat: int
    dict_path: str = None

    parts = ("left_eye", "right_eye", "nose", "mouth")
    feature_sizes = (256, 128, 64, 32)
    vgg_layers = ("relu2_2", "relu3_4", "relu4_4", "conv5_4")
    channel_sizes = (128, 256, 512, 512)

    def setup(self):
        self.vgg_extractor = VGGFeatureExtractor(
            layer_name_list=list(self.vgg_layers), use_input_norm=True,
            range_norm=True, name="vgg_extractor")
        attn = {}
        for idx, f_size in enumerate(self.feature_sizes):
            for name in self.parts:
                attn[f"{name}_{f_size}"] = AttentionBlock(
                    self.channel_sizes[idx],
                    name=f"attn_blocks.{name}_{f_size}")
        self.attn_blocks = attn
        self.multi_scale_dilation = MSDilationBlock(
            self.num_feat * 8, dilation=(4, 3, 2, 1),
            name="multi_scale_dilation")
        self.upsample0 = SFTUpBlock(self.num_feat * 8, self.num_feat * 8,
                                    name="upsample0")
        self.upsample1 = SFTUpBlock(self.num_feat * 8, self.num_feat * 4,
                                    name="upsample1")
        self.upsample2 = SFTUpBlock(self.num_feat * 4, self.num_feat * 2,
                                    name="upsample2")
        self.upsample3 = SFTUpBlock(self.num_feat * 2, self.num_feat,
                                    name="upsample3")
        self.up4_conv0 = SNConv2d(self.num_feat, self.num_feat, 3, padding=1,
                                  name="upsample4.0")
        self.up4_res = [UpResBlock(self.num_feat, name=f"upsample4.{i}")
                        for i in (2, 3)]
        self.up4_out = nn.Conv(3, (3, 3), padding=[(1, 1)] * 2,
                               name="upsample4.4")

    def swap_feat(self, vgg_feat, updated_feat, dict_feat, location,
                  part_name, f_size):
        """(ref: dfdnet_arch.py:105-124). dict_feat: (N, h, w, C) NHWC."""
        x0, y0, x1, y1 = [int(v) for v in location]
        part_feat = vgg_feat[:, y0:y1, x0:x1, :]
        part_resize_feat = resize_to(part_feat, dict_feat.shape[1],
                                     dict_feat.shape[2], "bilinear")
        dict_feat_n = adaptive_instance_normalization(dict_feat,
                                                      part_resize_feat)
        # correlation of the query patch with every dictionary atom: one
        # valid conv whose filters are the atoms (OIHW) -> (1,1,1,N)
        kern = dict_feat_n.transpose(0, 3, 1, 2)  # N,C,h,w
        score = lax.conv_general_dilated(
            part_resize_feat, kern.transpose(2, 3, 1, 0), (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        select_idx = jnp.argmax(nn.softmax(score.reshape(-1)))
        swap = _nearest_resize_like(dict_feat_n[select_idx][None],
                                    part_feat.shape[1], part_feat.shape[2])
        attn = self.attn_blocks[f"{part_name}_{f_size}"](swap - part_feat)
        attn_feat = attn * swap
        return updated_feat.at[:, y0:y1, x0:x1, :].set(attn_feat + part_feat)

    def __call__(self, x, part_locations, dictionary):
        """x: (1, 512, 512, 3) in [-1, 1]; part_locations: list of 4 arrays
        (b, 4) in 512-scale coords; dictionary: {f_size: {part: (N,h,w,C)}}."""
        vgg_features = self.vgg_extractor(x)
        updated_vgg_features = []
        batch = 0
        for vgg_layer, f_size in zip(self.vgg_layers, self.feature_sizes):
            dict_features = dictionary[f"{f_size}"]
            vgg_feat = vgg_features[vgg_layer]
            updated_feat = vgg_feat
            for part_idx, part_name in enumerate(self.parts):
                location = [int(v) for v in
                            (part_locations[part_idx][batch]
                             // (512 // f_size))]
                updated_feat = self.swap_feat(
                    vgg_feat, updated_feat, dict_features[part_name],
                    location, part_name, f_size)
            updated_vgg_features.append(updated_feat)

        vgg_feat_dilation = self.multi_scale_dilation(
            vgg_features["conv5_4"])
        feat = self.upsample0(vgg_feat_dilation, updated_vgg_features[3])
        feat = self.upsample1(feat, updated_vgg_features[2])
        feat = self.upsample2(feat, updated_vgg_features[1])
        feat = self.upsample3(feat, updated_vgg_features[0])
        out = nn.leaky_relu(self.up4_conv0(feat), negative_slope=0.2)
        for blk in self.up4_res:
            out = blk(out)
        return jnp.tanh(self.up4_out(out))


def _nearest_resize_like(x, out_h, out_w):
    """torch F.interpolate default (nearest) used for the dict->part resize
    (ref: dfdnet_arch.py:118)."""
    h, w = x.shape[1], x.shape[2]
    iy = (jnp.arange(out_h) * h // out_h).astype(jnp.int32)
    ix = (jnp.arange(out_w) * w // out_w).astype(jnp.int32)
    return x[:, iy][:, :, ix]
