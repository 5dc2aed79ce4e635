from .window_attention import window_attention, set_default_impl
from .swin_block import fused_swin_block, make_fused_swinir

__all__ = [
    "window_attention",
    "set_default_impl",
    "fused_swin_block",
    "make_fused_swinir",
]
