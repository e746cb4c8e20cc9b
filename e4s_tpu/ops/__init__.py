from e4s_tpu.ops.upfirdn2d import (
    upfirdn2d,
    make_kernel,
    blur,
    upsample2,
    downsample2,
)
from e4s_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from e4s_tpu.ops.resize import (
    nearest_resize,
    bilinear_resize,
    adaptive_avg_pool2d,
)
from e4s_tpu.ops.masked_pool import masked_region_mean
