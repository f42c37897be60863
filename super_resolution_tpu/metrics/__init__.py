"""Metric registry and factory (ref: HAT/ESC/basicsr/metrics/__init__.py:10-20)."""

from copy import deepcopy

from super_resolution_tpu.utils.registry import METRIC_REGISTRY
from super_resolution_tpu.metrics.psnr_ssim import (  # noqa: F401
    calculate_psnr, calculate_ssim, calculate_psnr_jnp, calculate_ssim_jnp)
from super_resolution_tpu.metrics.niqe import calculate_niqe  # noqa: F401
from super_resolution_tpu.metrics.fid import (  # noqa: F401
    calculate_fid, calculate_frechet_distance, compute_statistics,
    extract_inception_features, load_patched_inception_v3)

__all__ = ["calculate_metric", "calculate_psnr", "calculate_ssim",
           "calculate_psnr_jnp", "calculate_ssim_jnp", "METRIC_REGISTRY"]


def calculate_metric(data: dict, opt: dict):
    """Dispatch on opt['type'] through the metric registry."""
    opt = deepcopy(opt)
    metric_type = opt.pop("type")
    return METRIC_REGISTRY.get(metric_type)(**data, **opt)
