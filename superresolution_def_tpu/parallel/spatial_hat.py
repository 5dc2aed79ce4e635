"""Spatially-sharded HAT / HybridHATRealESRGAN forward (inference).

Companion to spatial.py for the second generator family. The image H axis is
sharded across the mesh; one shard_map program runs the full forward with
explicit communication exactly where HAT's locality breaks:

- 3x3 convs (conv_first/RHAG conv/after_body/upsample/RRDB trunk): 1-row
  ppermute halo, zero at the global boundary;
- shifted windows: cyclic ws/2-row roll via halo exchange, PLUS the
  reference's shift masks (hat_arch.py:921-940) — the global
  (nW, 64, 64) mask is precomputed host-side and fed SHARDED so each
  device applies the mask rows of its own global window rows;
- CAB channel attention: global average pool becomes a local mean +
  `lax.pmean` over the shard axis (equal shard sizes);
- OCAB: the 12x12 overlap kv windows need (owin-ws)/2 = 2 halo rows from
  each neighbor (zero-filled at the global boundary, matching nn.Unfold's
  zero padding); W-side padding stays local.

Same params tree as models/hat.py / models/hybrid.py; deterministic
(eval) semantics — DropPath is identity. Exactness vs the dense model is
tested on the virtual 8-device mesh (tests/test_spatial_hat.py).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import (
    window_partition,
    window_reverse,
    relative_position_index_sa,
    relative_position_index_oca,
    shift_window_attn_mask,
)
from ..ops.pixelshuffle import pixel_shuffle
from ..ops.resize import resize_nearest
from ..kernels import window_attention
from .spatial import _halo_conv3, _roll_up, _roll_down, _ln, _dense, _gelu


def _conv1x1_simple(p, x):
    k = p["conv"]["kernel"]  # (1, 1, I, O)
    return x @ k[0, 0] + p["conv"]["bias"]


def _hab(p, x, ws, ss, heads, mask_local, axis, n):
    """One HAB on a local (B, Hl, W, C) shard."""
    b, hl, w, c = x.shape
    shortcut = x
    xn = _ln(p["norm1"], x)

    # CAB branch: two halo convs + channel attention with cross-shard mean
    y = _halo_conv3(xn, p["conv_block"]["conv1"]["conv"]["kernel"],
                    p["conv_block"]["conv1"]["conv"]["bias"], axis, n)
    y = _gelu(y)
    y = _halo_conv3(y, p["conv_block"]["conv2"]["conv"]["kernel"],
                    p["conv_block"]["conv2"]["conv"]["bias"], axis, n)
    pooled = lax.pmean(jnp.mean(y, axis=(1, 2), keepdims=True), axis)
    ca = p["conv_block"]["ca"]
    att = _conv1x1_simple(ca["ca_fc1"], pooled)
    att = jax.nn.relu(att)
    att = _conv1x1_simple(ca["ca_fc2"], att)
    conv_x = y * jax.nn.sigmoid(att)

    # (S)W-MSA with reference masks
    if ss > 0:
        shifted = _roll_up(xn, ss, axis, n)
        shifted = jnp.roll(shifted, -ss, axis=2)
    else:
        shifted = xn
    xw = window_partition(shifted, ws).reshape(-1, ws * ws, c)
    d = c // heads
    rpb = p["attn"]["relative_position_bias_table"]
    rpi = relative_position_index_sa(ws)
    bias = rpb[rpi.reshape(-1)].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
    qkv = _dense(p["attn"]["qkv"], xw).reshape(-1, ws * ws, 3, heads, d).transpose(2, 0, 3, 1, 4)
    attn = window_attention(
        qkv[0], qkv[1], qkv[2], bias, mask_local if ss > 0 else None, scale=d**-0.5
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(-1, ws * ws, c)
    attn = _dense(p["attn"]["proj"], attn).reshape(-1, ws, ws, c)
    shifted = window_reverse(attn, ws, hl, w)
    if ss > 0:
        attn_x = _roll_down(shifted, ss, axis, n)
        attn_x = jnp.roll(attn_x, ss, axis=2)
    else:
        attn_x = shifted

    x = shortcut + attn_x + conv_x * 0.01  # conv_scale
    m = _ln(p["norm2"], x)
    m = _dense(p["mlp"]["fc2"], _gelu(_dense(p["mlp"]["fc1"], m)))
    return x + m


def _ocab(p, x, ws, overlap_ratio, heads, axis, n):
    b, hl, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    pad = (owin - ws) // 2
    d = c // heads

    shortcut = x
    xn = _ln(p["norm1"], x)
    qkv = _dense(p["qkv"], xn)
    q = qkv[..., :c]
    kv = qkv[..., c:]

    # halo rows for the overlap windows (zeros at the global boundary)
    top = lax.ppermute(kv[:, -pad:], axis, [(i, (i + 1) % n) for i in range(n)])
    bot = lax.ppermute(kv[:, :pad], axis, [((i + 1) % n, i) for i in range(n)])
    idx = lax.axis_index(axis)
    top = jnp.where(idx == 0, jnp.zeros_like(top), top)
    bot = jnp.where(idx == n - 1, jnp.zeros_like(bot), bot)
    kvh = jnp.concatenate([top, kv, bot], axis=1)  # (B, Hl+2pad, W, 2C)
    kvp = jnp.pad(kvh, ((0, 0), (0, 0), (pad, pad), (0, 0)))  # W zero pad

    nh, nw = hl // ws, w // ws
    row_idx = np.arange(nh)[:, None] * ws + np.arange(owin)[None, :]
    col_idx = np.arange(nw)[:, None] * ws + np.arange(owin)[None, :]
    pch = kvp[:, row_idx]
    pch = pch[:, :, :, col_idx]
    pch = pch.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, owin * owin, 2 * c)
    k_w = pch[..., :c]
    v_w = pch[..., c:]

    q_w = window_partition(q, ws).reshape(-1, ws * ws, c)
    bw, nq, _ = q_w.shape
    nk = k_w.shape[1]
    qh = q_w.reshape(bw, nq, heads, d).transpose(0, 2, 1, 3)
    kh = k_w.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    vh = v_w.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)

    rpb = p["relative_position_bias_table"]
    rpi = relative_position_index_oca(ws, overlap_ratio)
    bias = rpb[rpi.reshape(-1)].reshape(nq, nk, heads).transpose(2, 0, 1)
    out = window_attention(qh, kh, vh, bias, None, scale=d**-0.5)
    out = out.transpose(0, 2, 1, 3).reshape(bw, nq, c)
    out = out.reshape(-1, ws, ws, c)
    out = window_reverse(out, ws, hl, w)

    x = _dense(p["proj"], out) + shortcut
    m = _ln(p["norm2"], x)
    m = _dense(p["mlp"]["fc2"], _gelu(_dense(p["mlp"]["fc1"], m)))
    return x + m


def make_spatial_hat(
    mesh: Mesh,
    *,
    depths: Sequence[int] = (6, 6, 6, 6),
    num_heads: Sequence[int] = (6, 6, 6, 6),
    window_size: int = 8,
    overlap_ratio: float = 0.5,
    upscale: int = 2,
    upsampler: str = "pixelshuffle",
    axis: str | None = None,
):
    """Build `fn(params, x)` running HAT H-sharded over `mesh` (eval mode).

    x: (B, H, W, 1), H % (n_devices * ws) == 0, W % ws == 0.
    """
    axis = axis or mesh.axis_names[0]
    n = int(mesh.devices.size)
    ws = window_size
    local_fwd = _make_hat_local(
        depths, num_heads, ws, axis, n, overlap_ratio=overlap_ratio, upscale=upscale
    )

    sharded = jax.jit(
        shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None), {"shift": P(axis, None, None)}),
            out_specs=P(None, axis, None, None),
        )
    )

    def fn(params, x):
        b, h, w, _ = x.shape
        assert h % (n * ws) == 0 and w % ws == 0
        # global shift mask, rows sharded to match each device's windows
        mask = np.asarray(shift_window_attn_mask(h, w, ws, ws // 2), np.float32)
        masks = {"shift": jnp.asarray(mask)}
        params = jax.device_put(params, NamedSharding(mesh, P()))
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        masks = jax.device_put(masks, {"shift": NamedSharding(mesh, P(axis, None, None))})
        return sharded(params, x, masks)

    return fn


def make_spatial_hybrid(
    mesh: Mesh,
    *,
    depths: Sequence[int] = (6, 6, 6, 6),
    num_heads: Sequence[int] = (6, 6, 6, 6),
    window_size: int = 8,
    num_rrdb: int = 12,
    axis: str | None = None,
):
    """H-sharded HybridHATRealESRGAN forward (eval): HAT x2 + RRDB + x2."""
    axis = axis or mesh.axis_names[0]
    n = int(mesh.devices.size)
    ws = window_size

    def _kconv(p, x):
        return _halo_conv3(x, p["conv"]["kernel"], p["conv"]["bias"], axis, n)

    def _lrelu(x):
        return jnp.where(x >= 0, x, x * 0.2)

    def _rdb(p, x):
        x1 = _lrelu(_kconv(p["conv1"], x))
        x2 = _lrelu(_kconv(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(_kconv(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(_kconv(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _kconv(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x

    def _rrdb(p, x):
        out = _rdb(p["rdb1"], x)
        out = _rdb(p["rdb2"], out)
        out = _rdb(p["rdb3"], out)
        return out * 0.2 + x

    # reuse the HAT local forward by building its pieces inline
    hat_local = _make_hat_local(depths, num_heads, ws, axis, n)

    def local_fwd(params, x, masks):
        hat_out = hat_local(params["hat"], x, masks)
        feat = _lrelu(_kconv(params["conv_adapt"], hat_out))
        trunk = feat
        for r in range(num_rrdb):
            trunk = _rrdb(params[f"rrdb_trunk_{r}"], trunk)
        trunk = _kconv(params["conv_body"], trunk)
        feat = feat + trunk
        feat = _lrelu(_kconv(params["conv_up"], resize_nearest(feat, 2)))
        out = _kconv(params["conv_last"], _lrelu(_kconv(params["conv_hr"], feat)))
        return out

    sharded = jax.jit(
        shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(P(), P(None, axis, None, None), {"shift": P(axis, None, None)}),
            out_specs=P(None, axis, None, None),
        )
    )

    def fn(params, x):
        b, h, w, _ = x.shape
        assert h % (n * ws) == 0 and w % ws == 0
        mask = np.asarray(shift_window_attn_mask(h, w, ws, ws // 2), np.float32)
        masks = {"shift": jnp.asarray(mask)}
        params = jax.device_put(params, NamedSharding(mesh, P()))
        x = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
        masks = jax.device_put(masks, {"shift": NamedSharding(mesh, P(axis, None, None))})
        return sharded(params, x, masks)

    return fn


def _make_hat_local(depths, num_heads, ws, axis, n, overlap_ratio=0.5, upscale=2):
    """HAT local forward (pixelshuffle head) shared by HAT/Hybrid wrappers."""

    def hat_local(params, x, masks):
        cf = params["conv_first"]["conv"]
        feat = _halo_conv3(x, cf["kernel"], cf["bias"], axis, n)
        res = feat
        if "patch_norm" in params:
            res = _ln(params["patch_norm"], res)
        for i, depth in enumerate(depths):
            g = params[f"layers_{i}"]
            gin = res
            for j in range(depth):
                ss = 0 if j % 2 == 0 else ws // 2
                res = _hab(
                    g[f"blocks_{j}"], res, ws, ss, num_heads[i],
                    masks["shift"] if ss > 0 else None, axis, n,
                )
            res = _ocab(g["overlap_attn"], res, ws, overlap_ratio, num_heads[i], axis, n)
            res = _halo_conv3(res, g["conv"]["conv"]["kernel"], g["conv"]["conv"]["bias"], axis, n) + gin
        res = _ln(params["norm"], res)
        cab = params["conv_after_body"]["conv"]
        feat = _halo_conv3(res, cab["kernel"], cab["bias"], axis, n) + feat

        cbu = params["conv_before_upsample"]["conv"]
        out = _halo_conv3(feat, cbu["kernel"], cbu["bias"], axis, n)
        out = jnp.where(out >= 0, out, out * 0.01)
        n_up = int(np.log2(upscale))
        for s in range(n_up):
            up = params[f"upsample_{s}"]["conv"]
            out = _halo_conv3(out, up["kernel"], up["bias"], axis, n)
            out = pixel_shuffle(out, 2)
        cl = params["conv_last"]["conv"]
        return _halo_conv3(out, cl["kernel"], cl["bias"], axis, n)

    return hat_local
