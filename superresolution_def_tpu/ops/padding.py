"""Padding helpers with torch F.pad semantics (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad_2d(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Pad bottom by pad_h and right by pad_w with reflection.

    Matches ``F.pad(x, (0, pad_w, 0, pad_h), mode='reflect')`` used to round
    inputs up to a window multiple (reference architecture_swin.py:234-237).
    """
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
