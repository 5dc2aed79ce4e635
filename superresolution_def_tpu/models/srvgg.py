"""SRVGGNetCompact — compact VGG-style SR net (Real-ESRGAN family).

Capability parity with models/hat_arch/srvgg_arch.py:7-69: first conv +
num_conv x (3x3 conv + act) + conv to ch*scale^2 + PixelShuffle + nearest
residual. Present in the reference's arch registry (unused by trainers) —
provided here for the same availability.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.pixelshuffle import pixel_shuffle
from ..ops.resize import resize_nearest
from .layers import Conv2d, leaky_relu


class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"
    dtype: Any = jnp.float32

    def _act(self, x, idx):
        if self.act_type == "relu":
            return jnp.maximum(x, 0)
        if self.act_type == "leakyrelu":
            return leaky_relu(x, 0.1)
        # prelu: per-channel learnable slope, torch default init 0.25
        alpha = self.param(
            f"prelu_{idx}", lambda k, s: jnp.full(s, 0.25, jnp.float32), (x.shape[-1],)
        )
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = Conv2d(self.num_feat, 3, 1, 1, dtype=self.dtype, name="body_0")(x)
        out = self._act(out, 0)
        for i in range(1, self.num_conv + 1):
            out = Conv2d(self.num_feat, 3, 1, 1, dtype=self.dtype, name=f"body_{i}")(out)
            out = self._act(out, i)
        out = Conv2d(
            self.num_out_ch * self.upscale**2, 3, 1, 1, dtype=self.dtype, name="body_last"
        )(out)
        out = pixel_shuffle(out, self.upscale)
        return out + resize_nearest(x, self.upscale)
