"""EDVR — Video Restoration with Enhanced Deformable Convolutions (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/edvr_arch.py:9-382): per-frame
pyramid features, PCD (pyramid-cascading-deformable) alignment onto the
center frame via the TPU-native DCNv2 (ops/deform_conv.py), TSA
(temporal-spatial attention) fusion, residual reconstruction and x4
sub-pixel upsampling. Frames are (B, T, H, W, C).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from super_resolution_tpu.models.cnn_archs import ResidualBlockNoBN
from super_resolution_tpu.ops.deform_conv import (dcn_offset_mask_from_conv,
                                                  modulated_deform_conv2d)
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


def _conv3(feats, name, stride=1):
    return nn.Conv(feats, (3, 3), strides=(stride, stride),
                   padding=[(1, 1), (1, 1)], name=name)


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _up2(x):
    return resize_to(x, x.shape[1] * 2, x.shape[2] * 2, "bilinear")


def max_pool_3x3s2(x):
    """torch nn.MaxPool2d(3, stride=2, padding=1) parity."""
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                             ((0, 0), (1, 1), (1, 1), (0, 0)))


def avg_pool_3x3s2(x):
    """torch nn.AvgPool2d(3, stride=2, padding=1) parity
    (count_include_pad=True: always divide by 9)."""
    s = lax.reduce_window(x, 0.0, lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                          ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / 9.0


class DCNv2Pack(nn.Module):
    """Deformable-alignment DCN: offsets/masks from a SEPARATE feature
    (ref: basicsr/archs/arch_util.py:205-231)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    padding: int = 1
    deformable_groups: int = 8

    def setup(self):
        k = self.kernel_size
        n = self.in_channels * k * k
        stdv = 1.0 / n ** 0.5

        def w_init(key):
            import jax
            return jax.random.uniform(
                key, (self.out_channels, self.in_channels, k, k),
                minval=-stdv, maxval=stdv)

        self.weight = self.param("weight", w_init)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
        # zero-init so the DCN starts as a plain conv (ref: deform_conv.py
        # ModulatedDeformConvPack.init_weights)
        self.conv_offset = nn.Conv(
            self.deformable_groups * 3 * k * k, (k, k),
            padding=[(self.padding,) * 2] * 2,
            kernel_init=nn.initializers.zeros, name="conv_offset")

    def __call__(self, x, feat):
        offset, mask = dcn_offset_mask_from_conv(self.conv_offset(feat),
                                                 self.deformable_groups)
        return modulated_deform_conv2d(
            x, offset, mask, self.weight, self.bias, padding=self.padding,
            deformable_groups=self.deformable_groups)


class PCDAlignment(nn.Module):
    """Pyramid-cascading-deformable alignment (ref: edvr_arch.py:9-97)."""

    num_feat: int = 64
    deformable_groups: int = 8

    def setup(self):
        oc1, oc2, oc3, dcn, fc = {}, {}, {}, {}, {}
        for i in range(3, 0, -1):
            level = f"l{i}"
            oc1[level] = _conv3(self.num_feat, f"offset_conv1.{level}")
            if i == 3:
                oc2[level] = _conv3(self.num_feat, f"offset_conv2.{level}")
            else:
                oc2[level] = _conv3(self.num_feat, f"offset_conv2.{level}")
                oc3[level] = _conv3(self.num_feat, f"offset_conv3.{level}")
            dcn[level] = DCNv2Pack(self.num_feat, self.num_feat,
                                   deformable_groups=self.deformable_groups,
                                   name=f"dcn_pack.{level}")
            if i < 3:
                fc[level] = _conv3(self.num_feat, f"feat_conv.{level}")
        self.offset_conv1, self.offset_conv2, self.offset_conv3 = oc1, oc2, oc3
        self.dcn_pack, self.feat_conv = dcn, fc
        self.cas_offset_conv1 = _conv3(self.num_feat, "cas_offset_conv1")
        self.cas_offset_conv2 = _conv3(self.num_feat, "cas_offset_conv2")
        self.cas_dcnpack = DCNv2Pack(
            self.num_feat, self.num_feat,
            deformable_groups=self.deformable_groups, name="cas_dcnpack")

    def __call__(self, nbr_feat_l, ref_feat_l):
        upsampled_offset, upsampled_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            level = f"l{i}"
            offset = jnp.concatenate([nbr_feat_l[i - 1], ref_feat_l[i - 1]],
                                     axis=-1)
            offset = _lrelu(self.offset_conv1[level](offset))
            if i == 3:
                offset = _lrelu(self.offset_conv2[level](offset))
            else:
                offset = _lrelu(self.offset_conv2[level](
                    jnp.concatenate([offset, upsampled_offset], axis=-1)))
                offset = _lrelu(self.offset_conv3[level](offset))

            feat = self.dcn_pack[level](nbr_feat_l[i - 1], offset)
            if i < 3:
                feat = self.feat_conv[level](
                    jnp.concatenate([feat, upsampled_feat], axis=-1))
            if i > 1:
                feat = _lrelu(feat)
                upsampled_offset = _up2(offset) * 2
                upsampled_feat = _up2(feat)

        offset = jnp.concatenate([feat, ref_feat_l[0]], axis=-1)
        offset = _lrelu(self.cas_offset_conv2(_lrelu(
            self.cas_offset_conv1(offset))))
        return _lrelu(self.cas_dcnpack(feat, offset))


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (ref: edvr_arch.py:100-189).
    aligned_feat: (B, T, H, W, C) -> (B, H, W, C)."""

    num_feat: int = 64
    num_frame: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned_feat):
        b, t, h, w, c = aligned_feat.shape
        flat = aligned_feat.reshape(b * t, h, w, c)
        emb_ref = _conv3(self.num_feat, "temporal_attn1")(
            aligned_feat[:, self.center_frame_idx])
        emb = _conv3(self.num_feat, "temporal_attn2")(flat) \
            .reshape(b, t, h, w, -1)
        corr = jnp.sum(emb * emb_ref[:, None], axis=-1)       # (b,t,h,w)
        corr_prob = nn.sigmoid(corr)[..., None]               # (b,t,h,w,1)
        feat = (aligned_feat * corr_prob).transpose(0, 2, 3, 1, 4) \
            .reshape(b, h, w, t * c)
        fused = _lrelu(nn.Conv(self.num_feat, (1, 1), name="feat_fusion")(feat))

        attn = _lrelu(nn.Conv(self.num_feat, (1, 1), name="spatial_attn1")(feat))
        attn_max = max_pool_3x3s2(attn)
        attn_avg = avg_pool_3x3s2(attn)
        attn = _lrelu(nn.Conv(self.num_feat, (1, 1), name="spatial_attn2")(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(nn.Conv(self.num_feat, (1, 1),
                                    name="spatial_attn_l1")(attn))
        attn_max = max_pool_3x3s2(attn_level)
        attn_avg = avg_pool_3x3s2(attn_level)
        attn_level = _lrelu(_conv3(self.num_feat, "spatial_attn_l2")(
            jnp.concatenate([attn_max, attn_avg], axis=-1)))
        attn_level = _lrelu(_conv3(self.num_feat, "spatial_attn_l3")(attn_level))
        attn_level = _up2(attn_level)

        attn = _lrelu(_conv3(self.num_feat, "spatial_attn3")(attn)) + attn_level
        attn = _lrelu(nn.Conv(self.num_feat, (1, 1), name="spatial_attn4")(attn))
        attn = _up2(attn)
        attn = _conv3(self.num_feat, "spatial_attn5")(attn)
        attn_add = nn.Conv(self.num_feat, (1, 1), name="spatial_attn_add2")(
            _lrelu(nn.Conv(self.num_feat, (1, 1),
                           name="spatial_attn_add1")(attn)))
        attn = nn.sigmoid(attn)
        return fused * attn * 2 + attn_add


class PredeblurModule(nn.Module):
    """Pre-deblur pyramid head (ref: edvr_arch.py:192-242)."""

    num_feat: int = 64
    hr_in: bool = False

    def setup(self):
        self.conv_first = _conv3(self.num_feat, "conv_first")
        if self.hr_in:
            self.stride_conv_hr1 = _conv3(self.num_feat, "stride_conv_hr1", 2)
            self.stride_conv_hr2 = _conv3(self.num_feat, "stride_conv_hr2", 2)
        self.stride_conv_l2 = _conv3(self.num_feat, "stride_conv_l2", 2)
        self.stride_conv_l3 = _conv3(self.num_feat, "stride_conv_l3", 2)
        self.resblock_l3 = ResidualBlockNoBN(self.num_feat, name="resblock_l3")
        self.resblock_l2_1 = ResidualBlockNoBN(self.num_feat,
                                               name="resblock_l2_1")
        self.resblock_l2_2 = ResidualBlockNoBN(self.num_feat,
                                               name="resblock_l2_2")
        self.resblock_l1 = [ResidualBlockNoBN(self.num_feat,
                                              name=f"resblock_l1.{i}")
                            for i in range(5)]

    def __call__(self, x):
        feat_l1 = _lrelu(self.conv_first(x))
        if self.hr_in:
            feat_l1 = _lrelu(self.stride_conv_hr1(feat_l1))
            feat_l1 = _lrelu(self.stride_conv_hr2(feat_l1))
        feat_l2 = _lrelu(self.stride_conv_l2(feat_l1))
        feat_l3 = _lrelu(self.stride_conv_l3(feat_l2))
        feat_l3 = _up2(self.resblock_l3(feat_l3))
        feat_l2 = self.resblock_l2_1(feat_l2) + feat_l3
        feat_l2 = _up2(self.resblock_l2_2(feat_l2))
        for i in range(2):
            feat_l1 = self.resblock_l1[i](feat_l1)
        feat_l1 = feat_l1 + feat_l2
        for i in range(2, 5):
            feat_l1 = self.resblock_l1[i](feat_l1)
        return feat_l1


@ARCH_REGISTRY.register()
class EDVR(nn.Module):
    """EDVR (ref: edvr_arch.py:245-382). Input (B, T, H, W, C) in [0, 1];
    output the restored center frame (B, H*4, W*4, C) (x1 when hr_in)."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_frame: int = 5
    deformable_groups: int = 8
    num_extract_block: int = 5
    num_reconstruct_block: int = 10
    center_frame_idx: int = None
    hr_in: bool = False
    with_predeblur: bool = False
    with_tsa: bool = True

    def setup(self):
        center = (self.num_frame // 2 if self.center_frame_idx is None
                  else self.center_frame_idx)
        self.center = center
        if self.with_predeblur:
            self.predeblur = PredeblurModule(self.num_feat, self.hr_in,
                                             name="predeblur")
            self.conv_1x1 = nn.Conv(self.num_feat, (1, 1), name="conv_1x1")
        else:
            self.conv_first = _conv3(self.num_feat, "conv_first")
        self.feature_extraction = [
            ResidualBlockNoBN(self.num_feat, name=f"feature_extraction.{i}")
            for i in range(self.num_extract_block)]
        self.conv_l2_1 = _conv3(self.num_feat, "conv_l2_1", 2)
        self.conv_l2_2 = _conv3(self.num_feat, "conv_l2_2")
        self.conv_l3_1 = _conv3(self.num_feat, "conv_l3_1", 2)
        self.conv_l3_2 = _conv3(self.num_feat, "conv_l3_2")
        self.pcd_align = PCDAlignment(self.num_feat, self.deformable_groups,
                                      name="pcd_align")
        if self.with_tsa:
            self.fusion = TSAFusion(self.num_feat, self.num_frame, center,
                                    name="fusion")
        else:
            self.fusion = nn.Conv(self.num_feat, (1, 1), name="fusion")
        self.reconstruction = [
            ResidualBlockNoBN(self.num_feat, name=f"reconstruction.{i}")
            for i in range(self.num_reconstruct_block)]
        self.upconv1 = _conv3(self.num_feat * 4, "upconv1")
        self.upconv2 = _conv3(64 * 4, "upconv2")
        self.conv_hr = _conv3(64, "conv_hr")
        self.conv_last = _conv3(self.num_out_ch, "conv_last")

    def extract_pyramid(self, frames_flat):
        """(B*T, H, W, C) -> L1/L2/L3 feature pyramid."""
        if self.with_predeblur:
            feat_l1 = self.conv_1x1(self.predeblur(frames_flat))
        else:
            feat_l1 = _lrelu(self.conv_first(frames_flat))
        for blk in self.feature_extraction:
            feat_l1 = blk(feat_l1)
        feat_l2 = _lrelu(self.conv_l2_1(feat_l1))
        feat_l2 = _lrelu(self.conv_l2_2(feat_l2))
        feat_l3 = _lrelu(self.conv_l3_1(feat_l2))
        feat_l3 = _lrelu(self.conv_l3_2(feat_l3))
        return feat_l1, feat_l2, feat_l3

    def align_frames(self, feat_l1, feat_l2, feat_l3, b, t):
        """PCD-align every frame onto the center; returns (B,T,H,W,C)."""
        def by_frame(f, hw):
            return f.reshape((b, t) + f.shape[1:])

        f1 = feat_l1.reshape((b, t) + feat_l1.shape[1:])
        f2 = feat_l2.reshape((b, t) + feat_l2.shape[1:])
        f3 = feat_l3.reshape((b, t) + feat_l3.shape[1:])
        ref = [f1[:, self.center], f2[:, self.center], f3[:, self.center]]
        aligned = [self.pcd_align([f1[:, i], f2[:, i], f3[:, i]], ref)
                   for i in range(t)]
        return jnp.stack(aligned, axis=1)

    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.hr_in:
            assert h % 16 == 0 and w % 16 == 0
        else:
            assert h % 4 == 0 and w % 4 == 0
        x_center = x[:, self.center]

        feat_l1, feat_l2, feat_l3 = self.extract_pyramid(
            x.reshape(b * t, h, w, c))
        if self.with_predeblur and self.hr_in:
            h, w = h // 4, w // 4
        aligned = self.align_frames(feat_l1, feat_l2, feat_l3, b, t)

        if self.with_tsa:
            feat = self.fusion(aligned)
        else:
            feat = self.fusion(aligned.transpose(0, 2, 3, 1, 4)
                               .reshape(b, h, w, -1))

        out = feat
        for blk in self.reconstruction:
            out = blk(out)
        out = _lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = _lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = _lrelu(self.conv_hr(out))
        out = self.conv_last(out)
        if self.hr_in:
            base = x_center
        else:
            base = resize_to(x_center, h * 4, w * 4, "bilinear")
        return out + base
