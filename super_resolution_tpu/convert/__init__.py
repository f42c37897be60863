from super_resolution_tpu.convert.torch_import import (  # noqa: F401
    convert_state_dict, esc_rescale_to_img, flax_path_to_torch_name,
    flatten_params, load_torch_checkpoint, module_state_dict,
    strip_module_prefix, unflatten_params)
