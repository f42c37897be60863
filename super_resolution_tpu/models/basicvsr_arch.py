"""BasicVSR / IconVSR — recurrent video SR (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/basicvsr_arch.py:11-336):
SpyNet flows, bidirectional feature propagation with flow warping, and x4
sub-pixel reconstruction. TPU restructuring: the reference upsamples each
frame inside the propagation loop; here propagation collects per-frame
features and the whole reconstruction head runs ONCE over a (B*T) batch —
identical math, much better MXU utilization.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.cnn_archs import ResidualBlockNoBN
from super_resolution_tpu.models.edvr_arch import (PCDAlignment, TSAFusion,
                                                   _conv3, _lrelu)
from super_resolution_tpu.models.spynet_arch import SpyNet
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.flow import flow_warp
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class ConvResidualBlocks(nn.Module):
    """conv + LReLU + N residual blocks (ref: basicvsr_arch.py:101-117)."""

    num_out_ch: int = 64
    num_block: int = 15

    def setup(self):
        self.head = nn.Conv(self.num_out_ch, (3, 3), padding=[(1, 1)] * 2,
                            name="main.0")
        self.blocks = [ResidualBlockNoBN(self.num_out_ch, name=f"main.2.{i}")
                       for i in range(self.num_block)]

    def __call__(self, x):
        x = _lrelu(self.head(x))
        for blk in self.blocks:
            x = blk(x)
        return x


@ARCH_REGISTRY.register()
class BasicVSR(nn.Module):
    """BasicVSR x4 (ref: basicvsr_arch.py:11-98). Input (B, T, H, W, 3)."""

    num_feat: int = 64
    num_block: int = 15
    spynet_path: str = None

    def setup(self):
        self.spynet = SpyNet(name="spynet")
        self.backward_trunk = ConvResidualBlocks(self.num_feat,
                                                 self.num_block,
                                                 name="backward_trunk")
        self.forward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                                name="forward_trunk")
        self.fusion = nn.Conv(self.num_feat, (1, 1), name="fusion")
        self.upconv1 = _conv3(self.num_feat * 4, "upconv1")
        self.upconv2 = _conv3(64 * 4, "upconv2")
        self.conv_hr = _conv3(64, "conv_hr")
        self.conv_last = _conv3(3, "conv_last")

    def get_flow(self, x):
        b, n, h, w, c = x.shape
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = self.spynet(x1, x2).reshape(b, n - 1, h, w, 2)
        flows_forward = self.spynet(x2, x1).reshape(b, n - 1, h, w, 2)
        return flows_forward, flows_backward

    def __call__(self, x):
        flows_forward, flows_backward = self.get_flow(x)
        b, n, h, w, _ = x.shape

        # backward-time propagation
        out_l = [None] * n
        feat_prop = jnp.zeros((b, h, w, self.num_feat), x.dtype)
        for i in range(n - 1, -1, -1):
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            feat_prop = self.backward_trunk(
                jnp.concatenate([x[:, i], feat_prop], axis=-1))
            out_l[i] = feat_prop

        # forward-time propagation
        feats = []
        feat_prop = jnp.zeros_like(feat_prop)
        for i in range(n):
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            feat_prop = self.forward_trunk(
                jnp.concatenate([x[:, i], feat_prop], axis=-1))
            feats.append(jnp.concatenate([out_l[i], feat_prop], axis=-1))

        # batched reconstruction over all frames at once
        out = jnp.stack(feats, axis=1).reshape(b * n, h, w, -1)
        out = _lrelu(self.fusion(out))
        out = _lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = _lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = _lrelu(self.conv_hr(out))
        out = self.conv_last(out)
        base = resize_to(x.reshape(b * n, h, w, -1), h * 4, w * 4, "bilinear")
        return (out + base).reshape(b, n, h * 4, w * 4, -1)


class EDVRFeatureExtractor(nn.Module):
    """EDVR front end used for IconVSR keyframes
    (ref: basicvsr_arch.py:271-336)."""

    num_input_frame: int
    num_feat: int

    def setup(self):
        self.center = self.num_input_frame // 2
        self.conv_first = _conv3(self.num_feat, "conv_first")
        self.feature_extraction = [
            ResidualBlockNoBN(self.num_feat, name=f"feature_extraction.{i}")
            for i in range(5)]
        self.conv_l2_1 = _conv3(self.num_feat, "conv_l2_1", 2)
        self.conv_l2_2 = _conv3(self.num_feat, "conv_l2_2")
        self.conv_l3_1 = _conv3(self.num_feat, "conv_l3_1", 2)
        self.conv_l3_2 = _conv3(self.num_feat, "conv_l3_2")
        self.pcd_align = PCDAlignment(self.num_feat, 8, name="pcd_align")
        self.fusion = TSAFusion(self.num_feat, self.num_input_frame,
                                self.center, name="fusion")

    def __call__(self, x):
        b, n, h, w, c = x.shape
        feat_l1 = _lrelu(self.conv_first(x.reshape(-1, h, w, c)))
        for blk in self.feature_extraction:
            feat_l1 = blk(feat_l1)
        feat_l2 = _lrelu(self.conv_l2_2(_lrelu(self.conv_l2_1(feat_l1))))
        feat_l3 = _lrelu(self.conv_l3_2(_lrelu(self.conv_l3_1(feat_l2))))
        f1 = feat_l1.reshape((b, n) + feat_l1.shape[1:])
        f2 = feat_l2.reshape((b, n) + feat_l2.shape[1:])
        f3 = feat_l3.reshape((b, n) + feat_l3.shape[1:])
        ref = [f1[:, self.center], f2[:, self.center], f3[:, self.center]]
        aligned = jnp.stack(
            [self.pcd_align([f1[:, i], f2[:, i], f3[:, i]], ref)
             for i in range(n)], axis=1)
        return self.fusion(aligned)


@ARCH_REGISTRY.register()
class IconVSR(nn.Module):
    """IconVSR (ref: basicvsr_arch.py:120-268). Input (B, T, H, W, 3)."""

    num_feat: int = 64
    num_block: int = 15
    keyframe_stride: int = 5
    temporal_padding: int = 2
    spynet_path: str = None
    edvr_path: str = None

    def setup(self):
        self.edvr = EDVRFeatureExtractor(self.temporal_padding * 2 + 1,
                                         self.num_feat, name="edvr")
        self.spynet = SpyNet(name="spynet")
        self.backward_fusion = _conv3(self.num_feat, "backward_fusion")
        self.backward_trunk = ConvResidualBlocks(self.num_feat,
                                                 self.num_block,
                                                 name="backward_trunk")
        self.forward_fusion = _conv3(self.num_feat, "forward_fusion")
        self.forward_trunk = ConvResidualBlocks(self.num_feat, self.num_block,
                                                name="forward_trunk")
        self.upconv1 = _conv3(self.num_feat * 4, "upconv1")
        self.upconv2 = _conv3(64 * 4, "upconv2")
        self.conv_hr = _conv3(64, "conv_hr")
        self.conv_last = _conv3(3, "conv_last")

    def pad_spatial(self, x):
        b, t, h, w, c = x.shape
        pad_h = (4 - h % 4) % 4
        pad_w = (4 - w % 4) % 4
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                       mode="reflect")

    def get_flow(self, x):
        b, n, h, w, c = x.shape
        x1 = x[:, :-1].reshape(-1, h, w, c)
        x2 = x[:, 1:].reshape(-1, h, w, c)
        flows_backward = self.spynet(x1, x2).reshape(b, n - 1, h, w, 2)
        flows_forward = self.spynet(x2, x1).reshape(b, n - 1, h, w, 2)
        return flows_forward, flows_backward

    def get_keyframe_feature(self, x, keyframe_idx):
        if self.temporal_padding == 2:
            x = jnp.concatenate([x[:, (4, 3)], x, x[:, (-4, -5)]], axis=1)
        elif self.temporal_padding == 3:
            x = jnp.concatenate([x[:, (6, 5, 4)], x, x[:, (-5, -6, -7)]],
                                axis=1)
        num_frames = 2 * self.temporal_padding + 1
        return {i: self.edvr(x[:, i:i + num_frames]) for i in keyframe_idx}

    def __call__(self, x):
        b, n, _, h_input, w_input = (x.shape[0], x.shape[1], x.shape[4],
                                     x.shape[2], x.shape[3])
        x = self.pad_spatial(x)
        h, w = x.shape[2], x.shape[3]

        keyframe_idx = list(range(0, n, self.keyframe_stride))
        if keyframe_idx[-1] != n - 1:
            keyframe_idx.append(n - 1)

        flows_forward, flows_backward = self.get_flow(x)
        feats_keyframe = self.get_keyframe_feature(x, keyframe_idx)

        out_l = [None] * n
        feat_prop = jnp.zeros((b, h, w, self.num_feat), x.dtype)
        for i in range(n - 1, -1, -1):
            if i < n - 1:
                feat_prop = flow_warp(feat_prop, flows_backward[:, i])
            if i in keyframe_idx:
                feat_prop = self.backward_fusion(
                    jnp.concatenate([feat_prop, feats_keyframe[i]], axis=-1))
            feat_prop = self.backward_trunk(
                jnp.concatenate([x[:, i], feat_prop], axis=-1))
            out_l[i] = feat_prop

        feats = []
        feat_prop = jnp.zeros_like(feat_prop)
        for i in range(n):
            if i > 0:
                feat_prop = flow_warp(feat_prop, flows_forward[:, i - 1])
            if i in keyframe_idx:
                feat_prop = self.forward_fusion(
                    jnp.concatenate([feat_prop, feats_keyframe[i]], axis=-1))
            feat_prop = self.forward_trunk(
                jnp.concatenate([x[:, i], out_l[i], feat_prop], axis=-1))
            feats.append(feat_prop)

        out = jnp.stack(feats, axis=1).reshape(b * n, h, w, -1)
        out = _lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = _lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = _lrelu(self.conv_hr(out))
        out = self.conv_last(out)
        base = resize_to(x.reshape(b * n, h, w, -1), h * 4, w * 4, "bilinear")
        out = (out + base).reshape(b, n, h * 4, w * 4, -1)
        return out[:, :, :4 * h_input, :4 * w_input]
