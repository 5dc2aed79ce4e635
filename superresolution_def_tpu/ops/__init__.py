from .windows import (
    window_partition,
    window_reverse,
    relative_position_index_sa,
    relative_position_index_oca,
    shift_window_attn_mask,
)
from .pixelshuffle import pixel_shuffle, pixel_unshuffle
from .resize import (
    interpolate_nearest,
    interpolate_bilinear,
    resize_nearest,
)
from .padding import reflect_pad_2d
from .metrics import psnr, ssim, TrainMetrics, gaussian_window
from .normalize import log_stretch_normalize, robust_minmax, quantize_u16

__all__ = [
    "window_partition",
    "window_reverse",
    "relative_position_index_sa",
    "relative_position_index_oca",
    "shift_window_attn_mask",
    "pixel_shuffle",
    "pixel_unshuffle",
    "interpolate_nearest",
    "interpolate_bilinear",
    "resize_nearest",
    "reflect_pad_2d",
    "psnr",
    "ssim",
    "TrainMetrics",
    "gaussian_window",
    "log_stretch_normalize",
    "robust_minmax",
    "quantize_u16",
]
