"""BasicVSR++ — second-order grid propagation + flow-guided deformable
alignment (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/basicvsrpp_arch.py:14-418).
Four propagation branches (backward_1/forward_1/backward_2/forward_2) over
a shared spatial feature, each aligning first- and second-order neighbors
with a flow-guided DCNv2 whose offsets are bounded residues around the
optical flow. Reconstruction runs once over the (B*T) batch.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.basicvsr_arch import ConvResidualBlocks
from super_resolution_tpu.models.edvr_arch import _conv3, _lrelu
from super_resolution_tpu.models.spynet_arch import SpyNet
from super_resolution_tpu.ops.deform_conv import modulated_deform_conv2d
from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.flow import flow_warp
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class SecondOrderDeformableAlignment(nn.Module):
    """Flow-guided second-order deformable alignment
    (ref: basicvsrpp_arch.py:347-408)."""

    in_channels: int
    out_channels: int
    deformable_groups: int = 16
    max_residue_magnitude: float = 10.0

    def setup(self):
        k = 3
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
        self.co0 = _conv3(self.out_channels, "conv_offset.0")
        self.co2 = _conv3(self.out_channels, "conv_offset.2")
        self.co4 = _conv3(self.out_channels, "conv_offset.4")
        self.co6 = nn.Conv(27 * self.deformable_groups, (3, 3),
                           padding=[(1, 1)] * 2,
                           kernel_init=nn.initializers.zeros,
                           name="conv_offset.6")

    def __call__(self, x, extra_feat, flow_1, flow_2):
        feat = jnp.concatenate([extra_feat, flow_1, flow_2], axis=-1)
        out = _lrelu(self.co0(feat))
        out = _lrelu(self.co2(out))
        out = _lrelu(self.co4(out))
        out = self.co6(out)
        o1, o2, mask = jnp.split(out, 3, axis=-1)

        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        offset_1, offset_2 = jnp.split(offset, 2, axis=-1)
        # flow channels are (dx, dy); DCN offsets are (dy, dx) per tap
        f1 = jnp.tile(flow_1[..., ::-1], (1, 1, 1, offset_1.shape[-1] // 2))
        f2 = jnp.tile(flow_2[..., ::-1], (1, 1, 1, offset_2.shape[-1] // 2))
        offset = jnp.concatenate([offset_1 + f1, offset_2 + f2], axis=-1)
        mask = nn.sigmoid(mask)
        return modulated_deform_conv2d(
            x, offset, mask, self.weight, self.bias, padding=1,
            deformable_groups=self.deformable_groups)


@ARCH_REGISTRY.register()
class BasicVSRPlusPlus(nn.Module):
    """BasicVSR++ (ref: basicvsrpp_arch.py:14-344). Input (B, T, H, W, 3).

    `is_mirror_extended` replaces the reference's runtime tensor check
    (basicvsrpp_arch.py:109-121) — a data-dependent branch XLA can't trace;
    callers that mirror-extend the clip set it statically.
    """

    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.0
    is_low_res_input: bool = True
    spynet_path: str = None
    cpu_cache_length: int = 100  # accepted for config parity; unused on TPU
    is_mirror_extended: bool = False

    def setup(self):
        mid = self.mid_channels
        self.spynet = SpyNet(name="spynet")
        if self.is_low_res_input:
            self.feat_extract = ConvResidualBlocks(mid, 5, name="feat_extract")
        else:
            self.fe0 = nn.Conv(mid, (3, 3), strides=(2, 2),
                               padding=[(1, 1)] * 2, name="feat_extract.0")
            self.fe2 = nn.Conv(mid, (3, 3), strides=(2, 2),
                               padding=[(1, 1)] * 2, name="feat_extract.2")
            self.fe4 = ConvResidualBlocks(mid, 5, name="feat_extract.4")

        self.modules_order = ["backward_1", "forward_1", "backward_2",
                              "forward_2"]
        deform, backbone = {}, {}
        for i, module in enumerate(self.modules_order):
            deform[module] = SecondOrderDeformableAlignment(
                2 * mid, mid, 16, self.max_residue_magnitude,
                name=f"deform_align.{module}")
            backbone[module] = ConvResidualBlocks(
                mid, self.num_blocks, name=f"backbone.{module}")
        self.deform_align = deform
        self.backbone = backbone

        self.reconstruction = ConvResidualBlocks(mid, 5, name="reconstruction")
        self.upconv1 = _conv3(mid * 4, "upconv1")
        self.upconv2 = _conv3(64 * 4, "upconv2")
        self.conv_hr = _conv3(64, "conv_hr")
        self.conv_last = _conv3(3, "conv_last")

    def compute_flow(self, lqs):
        b, t, h, w, c = lqs.shape
        l1 = lqs[:, :-1].reshape(-1, h, w, c)
        l2 = lqs[:, 1:].reshape(-1, h, w, c)
        flows_backward = self.spynet(l1, l2).reshape(b, t - 1, h, w, 2)
        if self.is_mirror_extended:
            flows_forward = flows_backward[:, ::-1]
        else:
            flows_forward = self.spynet(l2, l1).reshape(b, t - 1, h, w, 2)
        return flows_forward, flows_backward

    def propagate(self, feats, flows, module_name):
        n, t_m1 = flows.shape[0], flows.shape[1]
        h, w = flows.shape[2], flows.shape[3]
        t = t_m1 + 1

        frame_idx = list(range(t))
        flow_idx = list(range(-1, t - 1))
        if "backward" in module_name:
            frame_idx = frame_idx[::-1]
            flow_idx = frame_idx

        feat_prop = jnp.zeros((n, h, w, self.mid_channels), flows.dtype)
        branch = []
        for i, idx in enumerate(frame_idx):
            feat_current = feats["spatial"][idx]
            if i > 0:
                flow_n1 = flows[:, flow_idx[i]]
                cond_n1 = flow_warp(feat_prop, flow_n1)
                feat_n2 = jnp.zeros_like(feat_prop)
                flow_n2 = jnp.zeros_like(flow_n1)
                cond_n2 = jnp.zeros_like(cond_n1)
                if i > 1:
                    feat_n2 = branch[-2]
                    flow_n2 = flows[:, flow_idx[i - 1]]
                    flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)
                    cond_n2 = flow_warp(feat_n2, flow_n2)
                cond = jnp.concatenate([cond_n1, feat_current, cond_n2],
                                       axis=-1)
                feat_prop = jnp.concatenate([feat_prop, feat_n2], axis=-1)
                feat_prop = self.deform_align[module_name](
                    feat_prop, cond, flow_n1, flow_n2)

            feat = jnp.concatenate(
                [feat_current]
                + [feats[k][idx] for k in feats
                   if k not in ("spatial", module_name)]
                + [feat_prop], axis=-1)
            feat_prop = feat_prop + self.backbone[module_name](feat)
            branch.append(feat_prop)

        if "backward" in module_name:
            branch = branch[::-1]
        feats[module_name] = branch
        return feats

    def __call__(self, lqs):
        b, t, h, w, c = lqs.shape

        if self.is_low_res_input:
            lqs_downsample = lqs
        else:
            lqs_downsample = resize_to(
                lqs.reshape(-1, h, w, c), h // 4, w // 4, "bicubic") \
                .reshape(b, t, h // 4, w // 4, c)

        feats = {}
        feats_flat = (self.feat_extract(lqs.reshape(-1, h, w, c))
                      if self.is_low_res_input else
                      self.fe4(_lrelu(self.fe2(_lrelu(
                          self.fe0(lqs.reshape(-1, h, w, c)))))))
        fh, fw = feats_flat.shape[1], feats_flat.shape[2]
        feats_ = feats_flat.reshape(b, t, fh, fw, -1)
        feats["spatial"] = [feats_[:, i] for i in range(t)]

        flows_forward, flows_backward = self.compute_flow(lqs_downsample)

        for iter_ in (1, 2):
            for direction in ("backward", "forward"):
                module = f"{direction}_{iter_}"
                feats[module] = []
                flows = (flows_backward if direction == "backward"
                         else flows_forward)
                feats = self.propagate(feats, flows, module)

        # batched reconstruction over all frames
        hr = jnp.stack(
            [jnp.concatenate(
                [feats["spatial"][i]]
                + [feats[k][i] for k in feats if k != "spatial"], axis=-1)
             for i in range(t)], axis=1).reshape(b * t, fh, fw, -1)
        hr = self.reconstruction(hr)
        hr = _lrelu(pixel_shuffle(self.upconv1(hr), 2))
        hr = _lrelu(pixel_shuffle(self.upconv2(hr), 2))
        hr = _lrelu(self.conv_hr(hr))
        hr = self.conv_last(hr)
        if self.is_low_res_input:
            base = resize_to(lqs.reshape(-1, h, w, c), h * 4, w * 4,
                             "bilinear")
        else:
            base = lqs.reshape(-1, h, w, c)
        hr = hr + base
        return hr.reshape((b, t) + hr.shape[1:])
