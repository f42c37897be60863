"""Loss factory (ref: basicsr/losses/__init__.py:19-31)."""

from copy import deepcopy

from super_resolution_tpu.utils.registry import LOSS_REGISTRY

from super_resolution_tpu.losses import basic  # noqa: F401 registry
from super_resolution_tpu.losses import gan  # noqa: F401 registry
from super_resolution_tpu.losses import perceptual  # noqa: F401 registry
from super_resolution_tpu.losses.gan import (  # noqa: F401
    GANLoss, MultiScaleGANLoss, gradient_penalty_loss, r1_penalty)
from super_resolution_tpu.losses.perceptual import PerceptualLoss  # noqa: F401
from super_resolution_tpu.losses.basic import (  # noqa: F401
    CharbonnierLoss, L1Loss, MSELoss, WeightedTVLoss, charbonnier_loss,
    l1_loss, mse_loss)


def build_loss(opt: dict):
    opt = deepcopy(opt)
    loss_type = opt.pop("type")
    return LOSS_REGISTRY.get(loss_type)(**opt)
