"""TOFlow — Task-Oriented Flow video enhancement (flax, NHWC).

Rebuild of the reference (ref: basicsr/archs/tof_arch.py:9-172): a
BatchNorm-bearing SpyNet variant estimates flow from the reference frame to
each of the 7 pre-upsampled LR frames; warped frames are fused by a small
conv head. Input (B, 7, H, W, 3), output (B, H, W, 3).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.models.arch_util import FrozenBatchNorm
from super_resolution_tpu.ops.flow import avg_pool2, flow_warp, resize_bilinear_ac
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class TOFBasicModule(nn.Module):
    """conv7x7(no bias)+BN+ReLU x4 + conv7x7 (ref: tof_arch.py:9-39)."""

    @nn.compact
    def __call__(self, x):
        for i, feats in enumerate((32, 64, 32, 16)):
            x = nn.Conv(feats, (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                        name=f"basic_module.{3 * i}")(x)
            x = nn.relu(FrozenBatchNorm(feats,
                                        name=f"basic_module.{3 * i + 1}")(x))
        return nn.Conv(2, (7, 7), padding=[(3, 3)] * 2,
                       name="basic_module.12")(x)


class SPyNetTOF(nn.Module):
    """4-level SpyNet for TOFlow (ref: tof_arch.py:42-90)."""

    def setup(self):
        self.levels = [TOFBasicModule(name=f"basic_module.{i}")
                       for i in range(4)]

    def __call__(self, ref, supp):
        b, h, w, _ = ref.shape
        ref_l = [ref]
        supp_l = [supp]
        for _ in range(3):
            ref_l.insert(0, avg_pool2(ref_l[0]))
            supp_l.insert(0, avg_pool2(supp_l[0]))

        flow = jnp.zeros((b, h // 16, w // 16, 2), ref.dtype)
        for i in range(4):
            flow_up = resize_bilinear_ac(flow, flow.shape[1] * 2,
                                         flow.shape[2] * 2) * 2.0
            flow = flow_up + self.levels[i](jnp.concatenate(
                [ref_l[i], flow_warp(supp_l[i], flow_up), flow_up], axis=-1))
        return flow


@ARCH_REGISTRY.register()
class TOFlow(nn.Module):
    """TOFlow (ref: tof_arch.py:94-172)."""

    adapt_official_weights: bool = False

    def setup(self):
        self.ref_idx = 0 if self.adapt_official_weights else 3
        self.mean = self.param(
            "mean", lambda _: jnp.asarray([0.485, 0.456, 0.406])
            .reshape(1, 1, 1, 3))
        self.std = self.param(
            "std", lambda _: jnp.asarray([0.229, 0.224, 0.225])
            .reshape(1, 1, 1, 3))
        self.spynet = SPyNetTOF(name="spynet")
        self.conv_1 = nn.Conv(64, (9, 9), padding=[(4, 4)] * 2, name="conv_1")
        self.conv_2 = nn.Conv(64, (9, 9), padding=[(4, 4)] * 2, name="conv_2")
        self.conv_3 = nn.Conv(64, (1, 1), name="conv_3")
        self.conv_4 = nn.Conv(3, (1, 1), name="conv_4")

    def __call__(self, lrs):
        if self.adapt_official_weights:
            lrs = lrs[:, (3, 0, 1, 2, 4, 5, 6)]
        b, n, h, w, c = lrs.shape

        lrs = (lrs - self.mean[:, None]) / self.std[:, None]
        lr_ref = lrs[:, self.ref_idx]
        aligned = []
        for i in range(7):
            if i == self.ref_idx:
                aligned.append(lr_ref)
            else:
                lr_supp = lrs[:, i]
                flow = self.spynet(lr_ref, lr_supp)
                aligned.append(flow_warp(lr_supp, flow))

        # torch cats frames channel-first: channel block f*3+c
        hr = jnp.concatenate(aligned, axis=-1)
        hr = nn.relu(self.conv_1(hr))
        hr = nn.relu(self.conv_2(hr))
        hr = nn.relu(self.conv_3(hr))
        hr = self.conv_4(hr) + lr_ref
        return hr * self.std[0] + self.mean[0]
