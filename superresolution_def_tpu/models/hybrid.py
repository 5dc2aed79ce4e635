"""HybridHATRealESRGAN — HAT x2 backbone + RRDB trunk + nearest-conv x2.

Capability parity with models/hybridmodels_hat.py:21-143: HAT (upscale=2,
pixelshuffle) -> conv_adapt + LeakyReLU(0.2) -> num_rrdb x RRDB -> conv_body
+ trunk residual -> nearest x2 + conv_up -> conv_hr -> conv_last. Net x4.
Conv layers outside HAT use kaiming-normal(fan_in) init like the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
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


class _ConvKB(nn.Module):
    """Registers a 3x3 conv's kernel+bias (same tree as KConv) WITHOUT
    applying it — the packed dense-block forward consumes weight slices."""

    shape: tuple  # (3, 3, in_features, out_features)

    @nn.compact
    def __call__(self):
        k = self.param("kernel", kaiming_normal_init, self.shape, jnp.float32)
        b = self.param("bias", _zeros_bias, (self.shape[-1],))
        return k, b


class _ConvP(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvKB(self.shape, name="conv")()


def dense_block_packed(kernels, biases, x, num_feat: int, num_grow_ch: int, dtype):
    """5-conv dense block evaluated as output-packed convs (TPU MXU layout).

    The reference computes conv_i(concat(x, x1..x_{i-1})) — five convs with
    24/48 output channels, i.e. <=37% of the MXU's 128 lanes. Reassociating
    by SOURCE instead of destination, each tensor's contributions to all
    later convs become ONE wide conv (144/120/96/72/48 output channels):
    identical math (conv is linear in its input-channel blocks; per-conv
    sums are reassembled before bias+activation), same FLOPs, ~2.5x less
    padded-MXU work.

    Partial sums accumulate in the COMPUTE dtype: measured on v5e, fp32
    partials double the intermediate HBM traffic and erase the win (234.7
    vs naive 234.9 ms for the 36-block trunk, batch 8 bf16) while bf16
    partials deliver it (185.8 ms, 1.26x). In fp32 mode this is exact.

    kernels/biases: the five (3,3,Cin_i,Cout_i)/(Cout_i,) reference-shaped
    weights of conv1..conv5 (hybridmodels_hat.py:21-44 layout).
    """
    f, g = num_feat, num_grow_ch
    offs = [0, f, f + g, f + 2 * g, f + 3 * g]
    sizes = [f, g, g, g, g]

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v.astype(dtype), k.astype(dtype), (1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    acc = [None] * 5  # pre-activation accumulator per conv (compute dtype)
    cur = x.astype(dtype)
    for s in range(5):  # source: x, x1, x2, x3, x4
        # source s feeds convs s..4; concat its kernel slices along Cout
        pack = jnp.concatenate(
            [kernels[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)],
            axis=-1,
        )
        y = conv(cur, pack)
        pos = 0
        for i in range(s, 5):
            w = kernels[i].shape[-1]
            part = y[..., pos : pos + w]
            acc[i] = part if acc[i] is None else acc[i] + part
            pos += w
        # conv s is now complete: bias + activation -> next source
        pre = acc[s] + biases[s].astype(dtype)
        cur = leaky_relu(pre, 0.2) if s < 4 else pre
    return cur * 0.2 + x.astype(dtype)


class ResidualDenseBlock(nn.Module):
    """5-conv dense block, 0.2 residual scale (hybridmodels_hat.py:21-44).

    Parameter tree and numerics match the reference layout (conv1..conv5
    consuming channel-concatenated inputs); the forward runs the packed
    reassociation (see :func:`dense_block_packed`)."""

    num_feat: int
    num_grow_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f, g = self.num_feat, self.num_grow_ch
        ks, bs = [], []
        for i, (cin, cout) in enumerate(
            [(f, g), (f + g, g), (f + 2 * g, g), (f + 3 * g, g), (f + 4 * g, f)]
        ):
            k, b = _ConvP((3, 3, cin, cout), name=f"conv{i + 1}")()
            ks.append(k)
            bs.append(b)
        return dense_block_packed(ks, bs, x, f, g, self.dtype)


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
    drop_path_rate: float = 0.1

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
            drop_path_rate=self.drop_path_rate,
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
