from radzero_tpu.ops.resize import (
    bicubic_resize_2d,
    bilinear_resize_2d,
    resize_matrix,
)
