from super_resolution_tpu.ops.windowing import (  # noqa: F401
    extract_overlap_windows, pad_to_multiple, window_partition, window_reverse)
from super_resolution_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle  # noqa: F401
from super_resolution_tpu.ops.conv import (  # noqa: F401
    conv2d_nhwc, depthwise_conv_nhwc, dynamic_depthwise_conv3x3,
    shifted_neighborhoods)
from super_resolution_tpu.ops.attention import (  # noqa: F401
    attention_with_bias, relative_position_index_oca,
    relative_position_index_sa, shift_attn_mask, window_msa)
