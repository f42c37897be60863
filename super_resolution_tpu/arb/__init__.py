from super_resolution_tpu.arb.models import (  # noqa: F401
    LIIF, LTE, MLP, MetaSR, make, make_coord, register, to_pixel_samples)
from super_resolution_tpu.arb import encoders  # noqa: F401 registry
from super_resolution_tpu.arb import data  # noqa: F401 registry
from super_resolution_tpu.arb.eval import arb_psnr, batched_predict  # noqa: F401
