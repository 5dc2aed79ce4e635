"""Fused dataset-normalization math (reference Dataset_step4 semantics).

The reference runs a two-pass CPU pipeline: sample valid pixels, take the
P4.0 / P99.99 percentiles of log1p-stretched values, then per image apply
log1p -> (x - min) / (max - min + 1e-8) -> clip[0,1] -> uint16.
(misc/Dataset_step4_normalization.py:22-28, 51-93, 159-177.)

Here the whole thing is a handful of batched XLA ops that run on-device over
stacked frames.
"""

from __future__ import annotations

import jax.numpy as jnp

BLACK_CLIP_PERCENTILE = 4.0
WHITE_CLIP_PERCENTILE = 99.99
MIN_VALID_PIXEL = 1e-5


def log_stretch(x: jnp.ndarray) -> jnp.ndarray:
    """log1p(max(x, 0)) — the reference's USE_LOG_STRETCH path."""
    return jnp.log1p(jnp.maximum(x, 0.0))


def robust_minmax(
    x: jnp.ndarray,
    black_pct: float = BLACK_CLIP_PERCENTILE,
    white_pct: float = WHITE_CLIP_PERCENTILE,
    use_log_stretch: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global (min, max) percentiles over pixels > MIN_VALID_PIXEL.

    Invalid pixels are excluded by replacing them with NaN and using the
    nan-aware percentile, mirroring the reference's masked sampling.
    """
    valid = x > MIN_VALID_PIXEL
    v = log_stretch(x) if use_log_stretch else x
    v = jnp.where(valid, v, jnp.nan)
    lo = jnp.nanpercentile(v, black_pct)
    hi = jnp.nanpercentile(v, white_pct)
    return lo, hi


def log_stretch_normalize(
    x: jnp.ndarray,
    global_min: jnp.ndarray,
    global_max: jnp.ndarray,
    use_log_stretch: bool = True,
) -> jnp.ndarray:
    """log1p -> affine by global stats -> clip[0,1] (float32)."""
    v = log_stretch(x) if use_log_stretch else x
    v = (v - global_min) / (global_max - global_min + 1e-8)
    return jnp.clip(v, 0.0, 1.0)


def quantize_u16(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> uint16 (x * 65535, trunc), reference TIFF encoding."""
    return (jnp.clip(x01, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
