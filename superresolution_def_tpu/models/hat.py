"""HAT (Hybrid Attention Transformer) generator — TPU-native Flax.

Capability parity with the reference's vendored HAT
(models/hat_arch/hat_arch.py:710-983): RHAG groups of HAB blocks (window
attention + parallel channel-attention conv branch scaled by conv_scale)
closed by an OCAB overlapping cross-attention block, masked shifted windows,
stochastic depth, mean-shift normalization, pixelshuffle reconstruction.

TPU-first choices:
  - NHWC throughout; window geometry via reshape/transpose (ops.windows);
  - OCAB's nn.Unfold is expressed as a static gather producing overlapping
    kv windows (same zero-padding semantics), fused by XLA;
  - shifted-window masks and relative-position index tables are host-side
    constants folded into the compiled program;
  - runtime-resolution windows: works at any window-multiple size.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    window_partition,
    window_reverse,
    relative_position_index_sa,
    relative_position_index_oca,
    shift_window_attn_mask,
)
from ..ops.pixelshuffle import pixel_shuffle
from ..kernels import window_attention
from .layers import Conv2d, Dense, LayerNorm, Mlp, gelu, leaky_relu, trunc_normal_init

Dtype = Any


class DropPath(nn.Module):
    """Stochastic depth per sample (timm semantics; hat_arch.py:11-37)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class ChannelAttention(nn.Module):
    """Squeeze-excite channel attention (RCAN style; hat_arch.py:40-58)."""

    num_feat: int
    squeeze_factor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        y = Conv2d(max(1, self.num_feat // self.squeeze_factor), 1, dtype=self.dtype, name="ca_fc1")(y)
        y = jax.nn.relu(y)
        y = Conv2d(self.num_feat, 1, dtype=self.dtype, name="ca_fc2")(y)
        return x * jax.nn.sigmoid(y)


class CAB(nn.Module):
    """Conv attention branch: 3x3 compress -> GELU -> 3x3 expand -> CA."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(max(1, self.num_feat // self.compress_ratio), 3, padding=1, dtype=self.dtype, name="conv1")(x)
        y = gelu(y)
        y = Conv2d(self.num_feat, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        return ChannelAttention(self.num_feat, self.squeeze_factor, dtype=self.dtype, name="ca")(y)


class WindowAttentionRPI(nn.Module):
    """Window MHSA with external rpi table (HAT passes rpi per call)."""

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
        rpb = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((2 * self.window_size - 1) ** 2, h),
        )
        rpi = relative_position_index_sa(self.window_size)
        bias = rpb[rpi.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        out = window_attention(
            qkv[0], qkv[1], qkv[2], bias, mask, scale=scale, impl=self.attn_impl
        )
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return Dense(c, dtype=self.dtype, name="proj")(out)


class HAB(nn.Module):
    """Hybrid Attention Block: (S)W-MSA + conv_scale * CAB + MLP."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 2.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_size: tuple[int, int],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hgt, wdt = x_size
        b, L, c = x.shape
        ws, ss = self.window_size, self.shift_size
        if min(x_size) <= ws:
            ss = 0
            ws = min(x_size)

        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x.reshape(b, hgt, wdt, c)

        conv_x = CAB(
            c, self.compress_ratio, self.squeeze_factor, dtype=self.dtype, name="conv_block"
        )(x)
        conv_x = conv_x.reshape(b, L, c)

        if ss > 0:
            shifted = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(shift_window_attn_mask(hgt, wdt, ws, ss))
        else:
            shifted = x
            mask = None

        xw = window_partition(shifted, ws).reshape(-1, ws * ws, c)
        attn = WindowAttentionRPI(
            self.dim, ws, self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )(xw, mask)
        attn = attn.reshape(-1, ws, ws, c)
        shifted = window_reverse(attn, ws, hgt, wdt)
        if ss > 0:
            attn_x = jnp.roll(shifted, shift=(ss, ss), axis=(1, 2))
        else:
            attn_x = shifted
        attn_x = attn_x.reshape(b, L, c)

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(attn_x, deterministic) + conv_x * self.conv_scale
        x = x + dp(
            Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(
                LayerNorm(dtype=self.dtype, name="norm2")(x)
            ),
            deterministic,
        )
        return x


def _overlap_windows(kv: jnp.ndarray, ws: int, owin: int) -> jnp.ndarray:
    """Extract overlapping (owin x owin) windows strided by ws, zero-padded.

    Equivalent to nn.Unfold(kernel=owin, stride=ws, padding=(owin-ws)//2)
    on NCHW (hat_arch.py:377,408) but expressed as a static gather in NHWC.
    Input (B, H, W, C) -> (B * nW, owin*owin, C).
    """
    b, h, w, c = kv.shape
    pad = (owin - ws) // 2
    kvp = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    nh, nw = h // ws, w // ws
    row_idx = np.arange(nh)[:, None] * ws + np.arange(owin)[None, :]  # (nh, owin)
    col_idx = np.arange(nw)[:, None] * ws + np.arange(owin)[None, :]  # (nw, owin)
    p = kvp[:, row_idx]            # (b, nh, owin, Wp, c)
    p = p[:, :, :, col_idx]        # (b, nh, owin, nw, owin, c)
    p = p.transpose(0, 1, 3, 2, 4, 5)  # (b, nh, nw, owin, owin, c)
    return p.reshape(b * nh * nw, owin * owin, c)


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat_arch.py:352-438)."""

    dim: int
    window_size: int
    overlap_ratio: float
    num_heads: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: tuple[int, int]) -> jnp.ndarray:
        hgt, wdt = x_size
        b, L, c = x.shape
        ws = self.window_size
        owin = int(ws * self.overlap_ratio) + ws
        heads = self.num_heads
        d = self.dim // heads
        scale = d**-0.5

        shortcut = x
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        xn = xn.reshape(b, hgt, wdt, c)

        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(xn)  # (b, h, w, 3c)
        q = qkv[..., :c]
        kv = qkv[..., c:]  # (b, h, w, 2c) — [k | v] channel halves

        q_windows = window_partition(q, ws).reshape(-1, ws * ws, c)
        kv_windows = _overlap_windows(kv, ws, owin)  # (b*nW, owin*owin, 2c)
        k_windows = kv_windows[..., :c]
        v_windows = kv_windows[..., c:]

        bw, nq, _ = q_windows.shape
        nk = k_windows.shape[1]
        qh = q_windows.reshape(bw, nq, heads, d).transpose(0, 2, 1, 3)
        kh = k_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
        vh = v_windows.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)

        rpb = self.param(
            "relative_position_bias_table",
            trunc_normal_init,
            ((ws + owin - 1) ** 2, heads),
        )
        rpi = relative_position_index_oca(ws, self.overlap_ratio)
        bias = rpb[rpi.reshape(-1)].reshape(nq, nk, heads).transpose(2, 0, 1)

        out = window_attention(qh, kh, vh, bias, None, scale=scale, impl=self.attn_impl)
        out = out.transpose(0, 2, 1, 3).reshape(bw, nq, self.dim)
        out = out.reshape(-1, ws, ws, self.dim)
        out = window_reverse(out, ws, hgt, wdt).reshape(b, L, self.dim)

        x = Dense(self.dim, dtype=self.dtype, name="proj")(out) + shortcut
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype, name="mlp")(
            LayerNorm(dtype=self.dtype, name="norm2")(x)
        )
        return x


class RHAG(nn.Module):
    """Residual Hybrid Attention Group: depth x HAB + OCAB + conv residual."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    drop_paths: Sequence[float]
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_size: tuple[int, int], deterministic: bool = True
    ) -> jnp.ndarray:
        res = x
        for j in range(self.depth):
            res = HAB(
                dim=self.dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if j % 2 == 0 else self.window_size // 2,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                mlp_ratio=self.mlp_ratio,
                drop_path=float(self.drop_paths[j]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{j}",
            )(res, x_size, deterministic)
        res = OCAB(
            dim=self.dim,
            window_size=self.window_size,
            overlap_ratio=self.overlap_ratio,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="overlap_attn",
        )(res, x_size)
        b, L, c = res.shape
        res = res.reshape(b, x_size[0], x_size[1], c)
        res = Conv2d(self.dim, 3, padding=1, dtype=self.dtype, name="conv")(res)
        return res.reshape(b, L, c) + x


class HAT(nn.Module):
    """Hybrid Attention Transformer. NHWC in [0,1].

    Hybrid train config (reference train_hat.py:132-136 via
    hybridmodels_hat.py:80-91): img_size=128, in_chans=1, embed_dim=90,
    depths=(6,6,6,6), heads=(6,6,6,6), window_size=8, upscale=2,
    upsampler='pixelshuffle', mlp_ratio defaults to 4 in hat_arch.
    """

    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 7
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    upscale: int = 2
    img_range: float = 1.0
    upsampler: str = ""
    num_feat: int = 64
    dtype: Dtype = jnp.float32
    attn_impl: str | None = None
    remat: bool = False  # jax.checkpoint each RHAG: activation memory / n_groups

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, h, w, cin = x.shape

        if cin == 3:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], dtype=x.dtype)
        else:
            mean = jnp.zeros((cin,), dtype=x.dtype)
        x = (x - mean) * self.img_range

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))

        feat = Conv2d(self.embed_dim, 3, padding=1, dtype=self.dtype, name="conv_first")(x)

        res = feat.reshape(b, h * w, self.embed_dim)
        if self.patch_norm:
            res = LayerNorm(dtype=self.dtype, name="patch_norm")(res)
        d0 = 0
        Group = nn.remat(RHAG, static_argnums=(2, 3)) if self.remat else RHAG
        for i, depth in enumerate(self.depths):
            res = Group(
                dim=self.embed_dim,
                depth=depth,
                num_heads=self.num_heads[i],
                window_size=self.window_size,
                compress_ratio=self.compress_ratio,
                squeeze_factor=self.squeeze_factor,
                conv_scale=self.conv_scale,
                overlap_ratio=self.overlap_ratio,
                mlp_ratio=self.mlp_ratio,
                drop_paths=tuple(dpr[d0 : d0 + depth]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"layers_{i}",
            )(res, (h, w), deterministic)
            d0 += depth
        res = LayerNorm(dtype=self.dtype, name="norm")(res)
        res = res.reshape(b, h, w, self.embed_dim)
        feat = Conv2d(self.embed_dim, 3, padding=1, dtype=self.dtype, name="conv_after_body")(res) + feat

        if self.upsampler == "pixelshuffle":
            out = Conv2d(self.num_feat, 3, padding=1, dtype=self.dtype, name="conv_before_upsample")(feat)
            out = leaky_relu(out, 0.01)
            if self.upscale == 3:
                out = Conv2d(9 * self.num_feat, 3, padding=1, dtype=self.dtype, name="upsample_0")(out)
                out = pixel_shuffle(out, 3)
            else:
                for s in range(int(np.log2(self.upscale))):
                    out = Conv2d(4 * self.num_feat, 3, padding=1, dtype=self.dtype, name=f"upsample_{s}")(out)
                    out = pixel_shuffle(out, 2)
            out = Conv2d(self.in_chans, 3, padding=1, dtype=self.dtype, name="conv_last")(out)
        else:
            out = feat

        return out / self.img_range + mean
