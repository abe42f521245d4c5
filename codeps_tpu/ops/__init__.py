from codeps_tpu.ops.grid_sample import grid_sample, grid_sample_pair
from codeps_tpu.ops.resize import (resize, resize_bilinear, resize_nearest,
                                   upsample_bilinear_2x_align,
                                   upsample_nearest_2x)
from codeps_tpu.ops.topk import top_k_mean

__all__ = [
    "grid_sample", "grid_sample_pair", "resize", "resize_bilinear",
    "resize_nearest", "top_k_mean", "upsample_bilinear_2x_align",
    "upsample_nearest_2x",
]
