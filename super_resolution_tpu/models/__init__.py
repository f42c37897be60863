"""Architecture registry + factory (ref: basicsr/archs/__init__.py:18-24).

Networks are selected by the same YAML `type:` strings the reference uses;
list-valued config entries are coerced to tuples (flax module fields must be
hashable).
"""

from copy import deepcopy

from super_resolution_tpu.utils.registry import ARCH_REGISTRY

# registry side-effect imports
from super_resolution_tpu.models import esc_arch  # noqa: F401
from super_resolution_tpu.models import hat_arch  # noqa: F401
from super_resolution_tpu.models import hat_classic_arch  # noqa: F401
from super_resolution_tpu.models import discriminator_arch  # noqa: F401
from super_resolution_tpu.models import swinir_arch  # noqa: F401
from super_resolution_tpu.models import hatx_arch  # noqa: F401
from super_resolution_tpu.models import esc_real_arch  # noqa: F401
from super_resolution_tpu.models import esc_fp_arch  # noqa: F401
from super_resolution_tpu.models import cnn_archs  # noqa: F401
from super_resolution_tpu.models import srformer_arch  # noqa: F401
from super_resolution_tpu.models import hybrid_hat_naf_arch  # noqa: F401
from super_resolution_tpu.models import hitsrf_arch  # noqa: F401
from super_resolution_tpu.models import atd_arch  # noqa: F401
from super_resolution_tpu.models import ecbsr_arch  # noqa: F401
from super_resolution_tpu.models import ridnet_arch  # noqa: F401
from super_resolution_tpu.models import spynet_arch  # noqa: F401
from super_resolution_tpu.models import edvr_arch  # noqa: F401
from super_resolution_tpu.models import basicvsr_arch  # noqa: F401
from super_resolution_tpu.models import basicvsrpp_arch  # noqa: F401
from super_resolution_tpu.models import tof_arch  # noqa: F401
from super_resolution_tpu.models import duf_arch  # noqa: F401
from super_resolution_tpu.models import stylegan2_arch  # noqa: F401
from super_resolution_tpu.models import stylegan2_bilinear_arch  # noqa: F401
from super_resolution_tpu.models import hifacegan_arch  # noqa: F401
from super_resolution_tpu.models import dfdnet_arch  # noqa: F401

__all__ = ["build_network", "ARCH_REGISTRY"]

# reference config keys that have no meaning for the flax modules
_IGNORED_KEYS = {"attn_drop_rate", "drop_rate", "qkv_bias", "qk_scale", "ape",
                 "use_checkpoint", "esc_use_dynamic", "patch_size"}


def _tuplify(v):
    return tuple(v) if isinstance(v, list) else v


def build_network(opt: dict):
    opt = deepcopy(opt)
    network_type = opt.pop("type")
    cls = ARCH_REGISTRY.get(network_type)
    kwargs = {k: _tuplify(v) for k, v in opt.items() if k not in _IGNORED_KEYS}
    # use_checkpoint (gradient checkpointing, ref hatx_arch.py:546-551) is
    # honored by the archs that declare the field (nn.remat per RHAG) and
    # dropped for the rest
    if "use_checkpoint" in opt and "use_checkpoint" in getattr(
            cls, "__dataclass_fields__", {}):
        kwargs["use_checkpoint"] = opt["use_checkpoint"]
    # reference attention-backend strings (esc_arch.py ATTN_TYPE) -> ours:
    # Naive/SDPA/Flex are all the XLA path here; 'pallas' selects the fused
    # kernel explicitly
    if kwargs.get("attn_type") in ("Naive", "SDPA", "Flex"):
        kwargs["attn_type"] = "xla"
    return cls(**kwargs)
