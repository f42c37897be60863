from super_resolution_tpu.utils.registry import (  # noqa: F401
    ARCH_REGISTRY, DATASET_REGISTRY, LOSS_REGISTRY, METRIC_REGISTRY,
    MODEL_REGISTRY, Registry)
from super_resolution_tpu.utils.color import (  # noqa: F401
    bgr2ycbcr, rgb2ycbcr, to_y_channel, ycbcr2rgb)
from super_resolution_tpu.utils.img import (  # noqa: F401
    crop_border, imfrombytes, img2tensor, imread, imwrite, mod_crop, tensor2img)
from super_resolution_tpu.utils.logger import (  # noqa: F401
    AvgTimer, MessageLogger, get_env_info, get_root_logger, init_tb_logger,
    master_only)
from super_resolution_tpu.utils.matlab import imresize, imresize_jnp  # noqa: F401
from super_resolution_tpu.utils.misc import (  # noqa: F401
    get_time_str, make_exp_dirs, mkdir_and_rename, scandir, set_random_seed,
    sizeof_fmt)
from super_resolution_tpu.utils.options import (  # noqa: F401
    copy_opt_file, dict2str, parse_options, process_options, yaml_load)
