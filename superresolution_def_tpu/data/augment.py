"""On-device paired augmentation — the reference's distribution, vectorized.

Reference (astronomical_dataset_swin.py:57-67, train split only): per sample,
independent p=0.5 horizontal flip, p=0.5 vertical flip, and k ~ U{0..3}
rot90, applied identically to the LR and HR patch. The reference does this
per-item on the CPU inside DataLoader workers; here it is a batched XLA
transform that runs fused into the jitted train step — zero host work, and
the (uint16 -> float / 65535) normalization rides along.

Shapes are static (square patches), so rot90 is a 4-way ``lax.switch``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rot90_times(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """(H, W, C) rotated k (traced, 0..3) quarter-turns (square H == W)."""
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(0, 1)),
            lambda x: jnp.rot90(x, 2, axes=(0, 1)),
            lambda x: jnp.rot90(x, 3, axes=(0, 1)),
        ],
        img,
    )


def _augment_one(lr: jnp.ndarray, hr: jnp.ndarray, key: jax.Array):
    kf, kv, kr = jax.random.split(key, 3)
    do_h = jax.random.bernoulli(kf)
    do_v = jax.random.bernoulli(kv)
    k = jax.random.randint(kr, (), 0, 4)

    def flip(img):
        img = jnp.where(do_h, img[:, ::-1, :], img)
        img = jnp.where(do_v, img[::-1, :, :], img)
        return _rot90_times(img, k)

    return flip(lr), flip(hr)


def augment_pair_batch(lr: jnp.ndarray, hr: jnp.ndarray, key: jax.Array):
    """Batched paired augmentation.

    Args:
      lr: (B, h, w, C) float; hr: (B, H, W, C) float (square spatial dims).
      key: PRNG key; split per-sample.
    Returns:
      (lr_aug, hr_aug) with identical per-sample transforms.
    """
    keys = jax.random.split(key, lr.shape[0])
    return jax.vmap(_augment_one)(lr, hr, keys)
