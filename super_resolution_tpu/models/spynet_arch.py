"""SpyNet optical-flow estimator (flax, NHWC).

Rebuild of the reference coarse-to-fine pyramid flow net
(ref: basicsr/archs/spynet_arch.py:9-96). Six levels; each level warps the
support frame by the upsampled flow and predicts a residual flow. Flow
tensors are (B, H, W, 2) with channel order (dx, dy) throughout.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from super_resolution_tpu.ops.degrade import resize_to
from super_resolution_tpu.ops.flow import avg_pool2, flow_warp, resize_bilinear_ac
from super_resolution_tpu.utils.registry import ARCH_REGISTRY


class SpyNetBasicModule(nn.Module):
    """conv7x7 stack 8->32->64->32->16->2 (ref: spynet_arch.py:10-25)."""

    @nn.compact
    def __call__(self, x):
        for i, feats in enumerate((32, 64, 32, 16)):
            x = nn.relu(nn.Conv(feats, (7, 7), padding=[(3, 3)] * 2,
                                name=f"basic_module.{2 * i}")(x))
        return nn.Conv(2, (7, 7), padding=[(3, 3)] * 2,
                       name="basic_module.8")(x)


@ARCH_REGISTRY.register()
class SpyNet(nn.Module):
    """SpyNet (ref: spynet_arch.py:28-96). load_path is handled by the
    checkpoint layer, not the module."""

    load_path: str = None

    def setup(self):
        self.levels = [SpyNetBasicModule(name=f"basic_module.{i}")
                       for i in range(6)]
        self.mean = self.param(
            "mean", lambda _: jnp.asarray([0.485, 0.456, 0.406])
            .reshape(1, 1, 1, 3))
        self.std = self.param(
            "std", lambda _: jnp.asarray([0.229, 0.224, 0.225])
            .reshape(1, 1, 1, 3))

    def _process(self, ref, supp):
        ref = [(ref - self.mean) / self.std]
        supp = [(supp - self.mean) / self.std]
        for _ in range(5):
            ref.insert(0, avg_pool2(ref[0]))
            supp.insert(0, avg_pool2(supp[0]))

        b = ref[0].shape[0]
        flow = jnp.zeros((b, ref[0].shape[1] // 2, ref[0].shape[2] // 2, 2),
                         ref[0].dtype)
        for level in range(len(ref)):
            up = resize_bilinear_ac(flow, flow.shape[1] * 2,
                                    flow.shape[2] * 2) * 2.0
            if up.shape[1] != ref[level].shape[1]:
                up = jnp.pad(up, ((0, 0), (0, 1), (0, 0), (0, 0)), mode="edge")
            if up.shape[2] != ref[level].shape[2]:
                up = jnp.pad(up, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
            inp = jnp.concatenate(
                [ref[level],
                 flow_warp(supp[level], up, padding_mode="border"), up],
                axis=-1)
            flow = self.levels[level](inp) + up
        return flow

    def __call__(self, ref, supp):
        h, w = ref.shape[1], ref.shape[2]
        w_floor = math.floor(math.ceil(w / 32.0) * 32.0)
        h_floor = math.floor(math.ceil(h / 32.0) * 32.0)
        ref_r = resize_to(ref, h_floor, w_floor, "bilinear")
        supp_r = resize_to(supp, h_floor, w_floor, "bilinear")
        flow = resize_to(self._process(ref_r, supp_r), h, w, "bilinear")
        return flow * jnp.asarray([w / w_floor, h / h_floor], flow.dtype)
