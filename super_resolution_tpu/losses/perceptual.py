"""VGG perceptual + style loss (ref: basicsr/losses/basic_loss.py
PerceptualLoss).

Weights must be provided via ``vgg_weights_path`` (a torchvision vgg19
.pth) — there is no network egress in deployment environments, so the
torchvision download path the reference relies on is replaced by an
explicit weights file.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from super_resolution_tpu.utils.registry import LOSS_REGISTRY


def _gram(feat):
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


@LOSS_REGISTRY.register()
class PerceptualLoss:

    def __init__(self, layer_weights: Dict[str, float], vgg_type: str = "vgg19",
                 use_input_norm: bool = True, range_norm: bool = False,
                 perceptual_weight: float = 1.0, style_weight: float = 0.0,
                 criterion: str = "l1", vgg_weights_path: str | None = None):
        from super_resolution_tpu.models.vgg_arch import (
            VGGFeatureExtractor, torchvision_vgg19_to_params)

        if vgg_type != "vgg19":
            raise NotImplementedError("only vgg19 is supported")
        self.layer_weights = layer_weights
        self.perceptual_weight = perceptual_weight
        self.style_weight = style_weight
        self.criterion = criterion
        self.net = VGGFeatureExtractor(tuple(layer_weights.keys()),
                                       use_input_norm=use_input_norm,
                                       range_norm=range_norm)
        if vgg_weights_path is None:
            raise ValueError(
                "PerceptualLoss needs vgg_weights_path (a torchvision vgg19 "
                ".pth); this environment cannot download torchvision weights.")
        import torch

        sd = torch.load(vgg_weights_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        self.params = torchvision_vgg19_to_params(sd)

    def _dist(self, a, b):
        if self.criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if self.criterion in ("l2", "mse"):
            return jnp.mean((a - b) ** 2)
        if self.criterion == "fro":
            return jnp.linalg.norm(a - b)
        raise NotImplementedError(self.criterion)

    def __call__(self, x, gt):
        """x, gt: NHWC RGB [0,1]. Returns (percep_loss, style_loss)."""
        fx = self.net.apply({"params": self.params}, x)
        fg = self.net.apply({"params": self.params},
                            jax.lax.stop_gradient(gt))
        percep = None
        style = None
        if self.perceptual_weight > 0:
            percep = sum(self._dist(fx[k], fg[k]) * w
                         for k, w in self.layer_weights.items())
            percep = percep * self.perceptual_weight
        if self.style_weight > 0:
            style = sum(self._dist(_gram(fx[k]), _gram(fg[k])) * w
                        for k, w in self.layer_weights.items())
            style = style * self.style_weight
        return percep, style
