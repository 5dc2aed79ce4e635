"""Interpolation ops matching torch.nn.functional.interpolate semantics.

The reference uses three interpolate flavors we must reproduce exactly:
  - 'nearest' (previews, SRVGG/hybrid residual paths; train_swin.py:334,
    hybridmodels_hat.py:127, srvgg_arch.py:67)
  - 'bilinear', align_corners=True  (discriminator_swin.py:38 size fix-up)
  - 'bilinear', align_corners=False (discriminator_hat.py:30,35,40)

All are expressed as one-dimensional gather/weight matrices applied as
matmuls over H then W — this maps onto the MXU instead of scatter/gather
units and is differentiable for free.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _nearest_index(out_size: int, in_size: int) -> np.ndarray:
    # torch 'nearest': src = floor(dst * in/out)
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def interpolate_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) -> (B, out_h, out_w, C), torch 'nearest' semantics."""
    out_h, out_w = size
    b, h, w, c = x.shape
    hi = _nearest_index(out_h, h)
    wi = _nearest_index(out_w, w)
    return x[:, hi][:, :, wi]


def resize_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor nearest upsample; for integer scale this is a pure
    broadcast (each pixel repeated scale x scale) — matches torch."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def _linear_weights(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out, in) interpolation matrix for 1-D linear resize."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.clip(src, 0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    w = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def interpolate_bilinear(
    x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """(B, H, W, C) -> (B, out_h, out_w, C), torch bilinear semantics.

    Separable: row matrix (out_h, H) and column matrix (out_w, W) applied as
    einsums — two small matmuls that ride the MXU.
    """
    out_h, out_w = size
    b, h, w, c = x.shape
    wh = jnp.asarray(_linear_weights(out_h, h, align_corners))
    ww = jnp.asarray(_linear_weights(out_w, w, align_corners))
    # HIGHEST precision: these weights encode exact interpolation fractions;
    # bf16 MXU rounding here would show up as visible pixel drift vs torch.
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=hp)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=hp)
    return x
