"""PSNR / SSIM with the reference's exact numerics (NHWC, jit-friendly).

Definitions reproduced bit-for-bit from the torch reference
(utils/metrics_swin.py:5-26):

  PSNR  = 10 * log10(1 / (MSE + 1e-8)), inputs clamped to [0, 1],
          MSE per-sample over (H, W, C), summed over the batch.
  SSIM  = single-scale, 11x11 Gaussian window sigma=1.5, depthwise 'valid'
          conv, C1 = 0.01^2, C2 = 0.03^2, mean over the whole batch map.

The accumulator mirrors TrainMetrics: psnr is a per-sample sum, ssim is the
batch-mean multiplied by the batch size, count is sample count.
"""

from __future__ import annotations

import dataclasses
from math import exp

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Separable Gaussian, normalized — (ws, ws) float32."""
    g = np.array(
        [exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    return g / g.sum()


def _depthwise_valid_conv(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) depthwise 'valid' conv with a (ws, ws) window."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(win[:, :, None, None], (*win.shape, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def _blur_valid_separable(x: jnp.ndarray, g1d: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' Gaussian blur as two 1-D passes.

    The reference's 2-D window IS the outer product of the 1-D Gaussian
    (np.outer in gaussian_window / torch create_window), and convolution is
    linear, so blurring rows then columns computes the identical map with
    window_size x fewer MACs — this sits inside the per-micro train metrics
    of the hat step (train_hat.py:228), where the five 11x11 fp32 convs at
    512^2 were a measurable slice of the step's non-phase overhead."""
    ws = g1d.shape[0]
    c = x.shape[-1]
    kh = jnp.broadcast_to(g1d[:, None, None, None], (ws, 1, 1, c))
    kw = jnp.broadcast_to(g1d[None, :, None, None], (1, ws, 1, c))
    kwargs = dict(
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.conv_general_dilated(
        jax.lax.conv_general_dilated(x, kh, **kwargs), kw, **kwargs
    )


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Scalar SSIM over the whole batch (NHWC), reference ssim_torch math.

    Always computed in float32 (the reference computes metrics in fp32 even
    under AMP — torch autocast exempts conv stats; bf16 inputs are upcast).
    The five Gaussian blurs run as ONE channel-stacked separable blur (the
    window is rank-1, so this is the same map as five 11x11 'valid' convs up
    to fp reassociation; parity locked in tests/test_ops.py)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    g1 = jnp.asarray(_gaussian_1d(window_size))
    c = img1.shape[-1]
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1
    )
    blurred = _blur_valid_separable(stack, g1)
    mu1 = blurred[..., 0 * c : 1 * c]
    mu2 = blurred[..., 1 * c : 2 * c]
    sigma1_sq = blurred[..., 2 * c : 3 * c] - mu1 * mu1
    sigma2_sq = blurred[..., 3 * c : 4 * c] - mu2 * mu2
    sigma12 = blurred[..., 4 * c : 5 * c] - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1 * mu1 + mu2 * mu2 + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-sample PSNR vector (B,), inputs clamped to [0, 1]."""
    p = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    t = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    mse = jnp.mean((p - t) ** 2, axis=tuple(range(1, p.ndim)))
    return 10.0 * jnp.log10(1.0 / (mse + 1e-8))


@jax.jit
def _metric_batch(pred: jnp.ndarray, target: jnp.ndarray):
    p = jnp.clip(pred, 0.0, 1.0)
    t = jnp.clip(target, 0.0, 1.0)
    psnr_sum = psnr(p, t).sum()
    ssim_val = ssim(p, t)
    return psnr_sum, ssim_val


@dataclasses.dataclass
class TrainMetrics:
    """Streaming PSNR/SSIM accumulator (reference TrainMetrics semantics)."""

    psnr: float = 0.0
    ssim: float = 0.0
    count: int = 0

    def reset(self) -> None:
        self.psnr, self.ssim, self.count = 0.0, 0.0, 0

    def update(self, pred: jnp.ndarray, target: jnp.ndarray) -> None:
        b = pred.shape[0]
        psnr_sum, ssim_val = _metric_batch(pred, target)
        self.psnr += float(psnr_sum)
        self.ssim += float(ssim_val) * b
        self.count += b

    def compute(self) -> dict:
        if not self.count:
            return {"psnr": 0.0, "ssim": 0.0}
        return {"psnr": self.psnr / self.count, "ssim": self.ssim / self.count}
