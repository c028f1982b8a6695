from .bias_act import bias_act, activation_funcs
from .upfirdn2d import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .conv import conv2d_resample, modulated_conv2d
from .grid_sample import grid_sample_2d, grid_sample_3d
from .filtered_lrelu import filtered_lrelu
