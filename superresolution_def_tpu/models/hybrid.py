"""HybridHATRealESRGAN — HAT x2 backbone + RRDB trunk + nearest-conv x2.

Capability parity with models/hybridmodels_hat.py:21-143: HAT (upscale=2,
pixelshuffle) -> conv_adapt + LeakyReLU(0.2) -> num_rrdb x RRDB -> conv_body
+ trunk residual -> nearest x2 + conv_up -> conv_hr -> conv_last. Net x4.
Conv layers outside HAT use kaiming-normal(fan_in) init like the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_nearest
from .layers import leaky_relu, kaiming_normal_init
from .hat import HAT

Dtype = Any


def _zeros_bias(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


class KConv(nn.Module):
    """3x3 conv, kaiming-normal weights, zero bias (hybridmodels init)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=kaiming_normal_init,
            bias_init=_zeros_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block, 0.2 residual scale (hybridmodels_hat.py:21-44)."""

    num_feat: int
    num_grow_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1 = leaky_relu(KConv(self.num_grow_ch, dtype=self.dtype, name="conv1")(x), 0.2)
        x2 = leaky_relu(
            KConv(self.num_grow_ch, dtype=self.dtype, name="conv2")(
                jnp.concatenate([x, x1], -1)
            ),
            0.2,
        )
        x3 = leaky_relu(
            KConv(self.num_grow_ch, dtype=self.dtype, name="conv3")(
                jnp.concatenate([x, x1, x2], -1)
            ),
            0.2,
        )
        x4 = leaky_relu(
            KConv(self.num_grow_ch, dtype=self.dtype, name="conv4")(
                jnp.concatenate([x, x1, x2, x3], -1)
            ),
            0.2,
        )
        x5 = KConv(self.num_feat, dtype=self.dtype, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1)
        )
        return x5 * 0.2 + x


class RRDBBlock(nn.Module):
    num_feat: int
    num_grow_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, dtype=self.dtype, name="rdb3")(out)
        return out * 0.2 + x


class HybridHATRealESRGAN(nn.Module):
    img_size: int = 128
    in_chans: int = 1
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    upscale: int = 4
    num_rrdb: int = 23
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        hat_out = HAT(
            img_size=self.img_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            depths=self.depths,
            num_heads=self.num_heads,
            window_size=self.window_size,
            upscale=2,
            upsampler="pixelshuffle",
            img_range=1.0,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            name="hat",
        )(x, deterministic)

        feat = leaky_relu(KConv(self.num_feat, dtype=self.dtype, name="conv_adapt")(hat_out), 0.2)
        trunk = feat
        for r in range(self.num_rrdb):
            trunk = RRDBBlock(
                self.num_feat, self.num_grow_ch, dtype=self.dtype, name=f"rrdb_trunk_{r}"
            )(trunk)
        trunk = KConv(self.num_feat, dtype=self.dtype, name="conv_body")(trunk)
        feat = feat + trunk

        feat = leaky_relu(
            KConv(self.num_feat, dtype=self.dtype, name="conv_up")(resize_nearest(feat, 2)),
            0.2,
        )
        out = KConv(self.in_chans, dtype=self.dtype, name="conv_last")(
            leaky_relu(KConv(self.num_feat, dtype=self.dtype, name="conv_hr")(feat), 0.2)
        )
        return out
