"""Spatially-sharded SwinIR forward — context parallelism over ICI.

The reference's answer to big frames is architectural locality (8x8 window
attention) plus a *claimed* tiler (README.md:158, never implemented). This
module is the TPU-native scaling path beyond tiling: the image's H axis is
sharded across the mesh and ONE shard_map'd program runs the whole SwinIR
forward with explicit halo exchange where locality breaks:

- 3x3 convs exchange a 1-row halo with neighbors (`ppermute`), zero-padded
  at the global boundary — bit-identical to the dense conv's zero padding;
- shifted windows (cyclic roll by ws/2) exchange ws/2 rows — bit-identical
  to the reference's global `torch.roll` (the reference uses NO shift mask,
  architecture_swin.py:138, so the cyclic semantics carry over exactly);
- everything else (LayerNorm, window attention, MLP, pixel shuffle) is
  pointwise or window-local, hence shard-local.

This is a functional re-expression of models/swinir.py's forward over the
SAME params tree — `spatial_swinir_apply(params, x)` == `SwinIR.apply` up
to float reassociation. Requirements: H divisible by (n_devices * ws),
W divisible by ws, H_local >= ws.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import window_partition, window_reverse, relative_position_index_sa
from ..ops.pixelshuffle import pixel_shuffle
from ..kernels import window_attention


# --------------------------------------------------------------------------- #
# halo primitives
# --------------------------------------------------------------------------- #
def _ring_fwd(n):  # dest i receives from source i-1  (send "down")
    return [(i, (i + 1) % n) for i in range(n)]


def _ring_bwd(n):  # dest i receives from source i+1  (send "up")
    return [((i + 1) % n, i) for i in range(n)]


def _halo_conv3(x, kernel, bias, axis, n):
    """3x3 stride-1 conv with global zero padding, H sharded."""
    top = lax.ppermute(x[:, -1:], axis, _ring_fwd(n))   # prev shard's last row
    bot = lax.ppermute(x[:, :1], axis, _ring_bwd(n))    # next shard's first row
    idx = lax.axis_index(axis)
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
    xx = jnp.concatenate([top, x, bot], axis=1)
    y = lax.conv_general_dilated(
        xx, kernel, (1, 1), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


def _roll_up(x, s, axis, n):
    """Global jnp.roll(x, -s, axis=1) on an H-sharded array."""
    recv = lax.ppermute(x[:, :s], axis, _ring_bwd(n))
    return jnp.concatenate([x[:, s:], recv], axis=1)


def _roll_down(x, s, axis, n):
    """Global jnp.roll(x, +s, axis=1)."""
    recv = lax.ppermute(x[:, -s:], axis, _ring_fwd(n))
    return jnp.concatenate([recv, x[:, :-s]], axis=1)


# --------------------------------------------------------------------------- #
# local math on the params tree (mirrors models/swinir.py modules)
# --------------------------------------------------------------------------- #
def _ln(p, x):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5) * p["ln"]["scale"] + p["ln"]["bias"]


def _dense(p, x):
    return x @ p["linear"]["kernel"] + p["linear"]["bias"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _block(p, x, ws, ss, num_heads, axis, n):
    """One SwinTransformerBlock on a (B, Hl, W, C) local shard."""
    b, hl, w, c = x.shape
    shortcut = x
    y = _ln(p["norm1"], x)
    if ss > 0:
        y = _roll_up(y, ss, axis, n)
        y = jnp.roll(y, -ss, axis=2)  # W stays unsharded: local roll

    xw = window_partition(y, ws).reshape(-1, ws * ws, c)
    h = num_heads
    d = c // h
    rpb = p["attn"]["relative_position_bias_table"]
    rpi = relative_position_index_sa(ws)
    bias = rpb[rpi.reshape(-1)].reshape(ws * ws, ws * ws, h).transpose(2, 0, 1)
    qkv = _dense(p["attn"]["qkv"], xw).reshape(-1, ws * ws, 3, h, d).transpose(2, 0, 3, 1, 4)
    attn = window_attention(qkv[0], qkv[1], qkv[2], bias, None, scale=d**-0.5)
    attn = attn.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    attn = _dense(p["attn"]["proj"], attn).reshape(-1, ws, ws, c)
    y = window_reverse(attn, ws, hl, w)

    if ss > 0:
        y = _roll_down(y, ss, axis, n)
        y = jnp.roll(y, ss, axis=2)

    x = shortcut + y
    m = _ln(p["norm2"], x)
    m = _dense(p["mlp"]["fc2"], _gelu(_dense(p["mlp"]["fc1"], m)))
    return x + m


# --------------------------------------------------------------------------- #
# the sharded forward
# --------------------------------------------------------------------------- #
def make_spatial_swinir(
    mesh: Mesh,
    *,
    depths: Sequence[int] = (6,) * 6,
    num_heads: Sequence[int] = (6,) * 6,
    window_size: int = 8,
    upscale: int = 4,
    axis: str | None = None,
):
    """Build `fn(params, x)` running SwinIR H-sharded over `mesh`.

    x: (B, H, W, 1) with H % (n_devices * window_size) == 0 and
    W % window_size == 0. Returns (B, H*upscale, W*upscale, 1), H-sharded.
    """
    axis = axis or mesh.axis_names[0]
    n = int(mesh.devices.size)
    ws = window_size
    n_up = int(np.log2(upscale)) if upscale != 3 else 1

    def local_fwd(params, x):
        cf = params["conv_first"]["conv"]
        x_first = _halo_conv3(x, cf["kernel"], cf["bias"], axis, n)

        res = x_first
        for i, depth in enumerate(depths):
            for j in range(depth):
                res = _block(
                    params[f"layers_{i}_{j}"],
                    res,
                    ws,
                    0 if j % 2 == 0 else ws // 2,
                    num_heads[i],
                    axis,
                    n,
                )
        res = _ln(params["norm"], res)
        cab = params["conv_after_body"]["conv"]
        res = _halo_conv3(res, cab["kernel"], cab["bias"], axis, n) + x_first

        cbu = params["conv_before_upsample"]["conv"]
        out = _halo_conv3(res, cbu["kernel"], cbu["bias"], axis, n)
        out = jnp.where(out >= 0, out, out * 0.01)  # LeakyReLU(0.01)
        if upscale == 3:
            up = params["upsample_0"]["conv"]
            out = _halo_conv3(out, up["kernel"], up["bias"], axis, n)
            out = pixel_shuffle(out, 3)
        else:
            for s in range(n_up):
                up = params[f"upsample_{s}"]["conv"]
                out = _halo_conv3(out, up["kernel"], up["bias"], axis, n)
                out = pixel_shuffle(out, 2)
        cl = params["conv_last"]["conv"]
        return _halo_conv3(out, cl["kernel"], cl["bias"], axis, n)

    sharded = jax.jit(
        shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None)),
            out_specs=P(None, axis, None, None),
        )
    )

    def fn(params, x):
        b, h, w, _ = x.shape
        assert h % (n * ws) == 0 and w % ws == 0, (
            f"H={h} must divide by n_devices*ws={n * ws}, W={w} by ws={ws}"
        )
        params = jax.device_put(params, NamedSharding(mesh, P()))
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        return sharded(params, x)

    return fn
