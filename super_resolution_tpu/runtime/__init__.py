"""Runner factory (ref: basicsr/models/__init__.py)."""

from copy import deepcopy

from super_resolution_tpu.utils.registry import MODEL_REGISTRY

from super_resolution_tpu.runtime import sr_model  # noqa: F401 registry
from super_resolution_tpu.runtime import realgan  # noqa: F401 registry
from super_resolution_tpu.runtime import esr_model  # noqa: F401 registry
from super_resolution_tpu.runtime import video_models  # noqa: F401 registry
from super_resolution_tpu.runtime import stylegan2_model  # noqa: F401 registry
from super_resolution_tpu.runtime import hifacegan_model  # noqa: F401 registry


def build_model(opt: dict):
    model_type = opt["model_type"]
    model = MODEL_REGISTRY.get(model_type)(deepcopy(opt))
    return model
