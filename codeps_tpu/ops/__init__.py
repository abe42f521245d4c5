from codeps_tpu.ops.grid_sample import grid_sample
from codeps_tpu.ops.resize import (resize, resize_bilinear, resize_nearest,
                                   upsample_bilinear_2x_align,
                                   upsample_nearest_2x)

__all__ = [
    "grid_sample", "resize", "resize_bilinear", "resize_nearest",
    "upsample_bilinear_2x_align", "upsample_nearest_2x",
]
