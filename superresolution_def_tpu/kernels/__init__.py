from .window_attention import window_attention, set_default_impl

__all__ = ["window_attention", "set_default_impl"]
