"""Pixel losses (ref: basicsr/losses/basic_loss.py).

Losses are pure functions wrapped in tiny config classes so the YAML
`type:`/`loss_weight`/`reduction` schema drives them unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from super_resolution_tpu.utils.registry import LOSS_REGISTRY

_REDUCTIONS = ("none", "mean", "sum")


def _reduce(x, reduction: str):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    return x


def l1_loss(pred, target, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), reduction)


def mse_loss(pred, target, reduction: str = "mean"):
    d = pred - target
    return _reduce(d * d, reduction)


def charbonnier_loss(pred, target, eps: float = 1e-12, reduction: str = "mean"):
    d = pred - target
    return _reduce(jnp.sqrt(d * d + eps), reduction)


class _WeightedLoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        if reduction not in _REDUCTIONS:
            raise ValueError(f"Unsupported reduction: {reduction}")
        self.loss_weight = loss_weight
        self.reduction = reduction


@LOSS_REGISTRY.register()
class L1Loss(_WeightedLoss):
    def __call__(self, pred, target, weight=None):
        if weight is not None:
            return self.loss_weight * _reduce(jnp.abs(pred - target) * weight,
                                              self.reduction)
        return self.loss_weight * l1_loss(pred, target, self.reduction)


@LOSS_REGISTRY.register()
class MSELoss(_WeightedLoss):
    def __call__(self, pred, target, weight=None):
        if weight is not None:
            d = pred - target
            return self.loss_weight * _reduce(d * d * weight, self.reduction)
        return self.loss_weight * mse_loss(pred, target, self.reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss(_WeightedLoss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean",
                 eps: float = 1e-12):
        super().__init__(loss_weight, reduction)
        self.eps = eps

    def __call__(self, pred, target, weight=None):
        d = pred - target
        v = jnp.sqrt(d * d + self.eps)
        if weight is not None:
            v = v * weight
        return self.loss_weight * _reduce(v, self.reduction)


@LOSS_REGISTRY.register()
class WeightedTVLoss(_WeightedLoss):
    """Total-variation loss (ref: basic_loss.py:118)."""

    def __call__(self, pred, weight=None):
        dy = jnp.abs(pred[:, 1:, :, :] - pred[:, :-1, :, :])
        dx = jnp.abs(pred[:, :, 1:, :] - pred[:, :, :-1, :])
        if weight is not None:
            dy = dy * weight[:, 1:, :, :]
            dx = dx * weight[:, :, 1:, :]
        return self.loss_weight * (_reduce(dy, self.reduction)
                                   + _reduce(dx, self.reduction))


def _local_variance(x, ksize: int):
    """Unbiased sliding-window variance over k x k reflect-padded windows
    (ref: basicsr/losses/loss_util.py::get_local_weights — the torch
    version materializes every window via unfold; here two reduce_window
    sums express it without the O(k^2) memory blowup, which XLA lowers to
    vectorized pad+adds on TPU)."""
    import jax.lax as lax

    pad = (ksize - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    win = (1, ksize, ksize, 1)
    ones = (1, 1, 1, 1)
    s = lax.reduce_window(xp, 0.0, lax.add, win, ones, "VALID")
    s2 = lax.reduce_window(xp * xp, 0.0, lax.add, win, ones, "VALID")
    n = ksize * ksize
    return (s2 - s * s / n) / (n - 1)


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize: int = 7):
    """LDL per-pixel artifact weight (Details-or-Artifacts, CVPR 2022;
    ref: basicsr/losses/loss_util.py::get_refined_artifact_map, consumed by
    realesrgan_model.py:222-225). NHWC; channel-summed residuals, per-image
    variance^(1/5) patch weight x local-window variance pixel weight,
    zeroed where the optimized output already beats the EMA output."""
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1,
                          keepdims=True)
    patch = jnp.var(residual_sr, axis=(1, 2, 3), keepdims=True,
                    ddof=1) ** (1 / 5)
    pixel = _local_variance(residual_sr, ksize)
    return jnp.where(residual_sr < residual_ema, 0.0, patch * pixel)
