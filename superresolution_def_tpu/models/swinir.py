"""SwinIR super-resolution generator — TPU-native Flax implementation.

Capability parity with the reference's simplified SwinIR
(models/architecture_swin.py:192-256), including its deliberate deviations
from canonical SwinIR:
  - shifted windows attend WITHOUT a boundary mask (ref :138 passes
    mask=None) — wrapped borders attend across the roll seam;
  - the reference constructor swallows ``mlp_ratio`` (and img_range/
    upsampler/resi_connection) into **kwargs and never forwards it, so every
    reference checkpoint uses the block default mlp_ratio=4 even though
    train_swin.py:149 passes 2. Our default is therefore 4.0; setting it
    explicitly is honored (an API extension the reference silently drops);
  - no drop-path / ape / dropout;
  - mlp_ratio defaults per train config;
  - reflect-pad input to a window multiple, crop output to H*scale x W*scale.

Differences by design (documented divergence, superset of behavior):
  - layout is NHWC (TPU conv layout);
  - blocks use the *runtime* (padded) resolution instead of the frozen
    construction-time ``img_size``, so the same weights run at any
    window-multiple size (the reference silently breaks off-resolution).

Weight porting from torch state_dicts is provided in
``superresolution_def_tpu.models.torch_port``.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    window_partition,
    window_reverse,
    relative_position_index_sa,
    reflect_pad_2d,
)
from ..ops.pixelshuffle import pixel_shuffle
from ..kernels import window_attention
from .layers import Conv2d, Dense, LayerNorm, Mlp, leaky_relu, trunc_normal_init

Dtype = Any


class WindowAttentionModule(nn.Module):
    """QKV projection + relative-position-bias window attention + proj."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        bw, n, c = x.shape
        h = self.num_heads
        d = c // h
        scale = d**-0.5

        rpb_table = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * self.window_size - 1) ** 2, h),
        )
        rpi = relative_position_index_sa(self.window_size)  # (N, N) np
        bias = rpb_table[rpi.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)  # (3, Bw, h, N, d)
        q, k, v = qkv[0], qkv[1], qkv[2]

        out = window_attention(q, k, v, bias, mask, scale=scale, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return Dense(c, dtype=self.dtype, name="proj")(out)


class SwinTransformerBlock(nn.Module):
    """W-MSA/SW-MSA block. NOTE: no shift mask — reference deviation."""

    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: tuple[int, int]) -> jnp.ndarray:
        hgt, wdt = x_size
        b, L, c = x.shape
        ws, ss = self.window_size, self.shift_size
        # reference rule: tiny inputs collapse to a single unshifted window
        if min(x_size) <= ws:
            ss = 0
            ws = min(x_size)

        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, hgt, wdt, c)

        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))

        xw = window_partition(x, ws).reshape(-1, ws * ws, c)
        attn = WindowAttentionModule(
            self.dim, ws, self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )(xw, mask=None)
        attn = attn.reshape(-1, ws, ws, c)
        x = window_reverse(attn, ws, hgt, wdt)

        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        x = x.reshape(b, L, c)

        x = shortcut + x
        x = x + Mlp(
            int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp"
        )(LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class SwinIR(nn.Module):
    """x`upscale` SR generator. Input/output NHWC, in [0,1].

    Train config (reference train_swin.py:147-149): upscale=4, in_chans=1,
    img_size=128, window_size=8, depths=[6]*6, embed_dim=180, heads=[6]*6.
    (mlp_ratio stays 4 — see module docstring.)
    """

    img_size: int = 64
    in_chans: int = 1
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6)
    window_size: int = 7
    mlp_ratio: float = 4.0
    upscale: int = 2
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None
    remat: bool = False  # jax.checkpoint each block: ~1/36 activation memory

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        ws = self.window_size
        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        x = reflect_pad_2d(x, pad_h, pad_w)
        hp, wp = h + pad_h, w + pad_w

        x_first = Conv2d(
            self.embed_dim, 3, padding=1, dtype=self.dtype, name="conv_first"
        )(x)

        res = x_first.reshape(b, hp * wp, self.embed_dim)  # patch embed (flatten)
        Block = (
            nn.remat(SwinTransformerBlock, static_argnums=(2,))
            if self.remat
            else SwinTransformerBlock
        )
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                res = Block(
                    dim=self.embed_dim,
                    num_heads=self.num_heads[i],
                    window_size=ws,
                    shift_size=0 if j % 2 == 0 else ws // 2,
                    mlp_ratio=self.mlp_ratio,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    name=f"layers_{i}_{j}",
                )(res, (hp, wp))

        res = LayerNorm(dtype=self.dtype, name="norm")(res)
        res = res.reshape(b, hp, wp, self.embed_dim)  # patch unembed
        res = Conv2d(
            self.embed_dim, 3, padding=1, dtype=self.dtype, name="conv_after_body"
        )(res) + x_first

        out = Conv2d(64, 3, padding=1, dtype=self.dtype, name="conv_before_upsample")(res)
        out = leaky_relu(out, 0.01)
        # Upsample: log2(scale) rounds of [conv(->4*64) + PixelShuffle(2)]
        n_steps = int(np.log2(self.upscale)) if self.upscale != 3 else 0
        if self.upscale == 3:
            out = Conv2d(9 * 64, 3, padding=1, dtype=self.dtype, name="upsample_0")(out)
            out = pixel_shuffle(out, 3)
        else:
            for s in range(n_steps):
                out = Conv2d(
                    4 * 64, 3, padding=1, dtype=self.dtype, name=f"upsample_{s}"
                )(out)
                out = pixel_shuffle(out, 2)
        out = Conv2d(self.in_chans, 3, padding=1, dtype=self.dtype, name="conv_last")(out)

        return out[:, : h * self.upscale, : w * self.upscale, :]
