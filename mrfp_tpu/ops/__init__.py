from mrfp_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    nearest_out_size,
)
from mrfp_tpu.ops.hist import confusion_matrix_update, fast_hist

__all__ = [
    "resize_bilinear_align_corners",
    "resize_nearest",
    "nearest_out_size",
    "confusion_matrix_update",
    "fast_hist",
]
