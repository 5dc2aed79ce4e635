"""PixelShuffle / PixelUnshuffle in NHWC with torch channel ordering.

torch.nn.PixelShuffle semantics (NCHW):
  out[b, c, h*r + i, w*r + j] = in[b, (c*r + i)*r + j, h, w]

We keep the identical (c, i, j) channel decomposition so torch-trained
weights for the preceding conv port bit-exactly (reference
architecture_swin.py:175-190, hat_arch.py:687-706).
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, upscale: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C)."""
    b, h, w, crr = x.shape
    r = upscale
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)           # last dims: (c, i, j)
    x = x.transpose(0, 1, 4, 2, 5, 3)          # (b, h, i, w, j, c)
    return x.reshape(b, h * r, w * r, c)


def pixel_unshuffle(x: jnp.ndarray, downscale: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r). Inverse of :func:`pixel_shuffle`."""
    b, hr, wr, c = x.shape
    r = downscale
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)            # (b, h, i, w, j, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # (b, h, w, c, i, j)
    return x.reshape(b, h, w, c * r * r)
