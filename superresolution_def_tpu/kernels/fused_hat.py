"""Fused-HAB HAT / HybridHATRealESRGAN inference forward.

Functional re-expression over the standard params tree: every HAB runs
through the fused VMEM kernel (kernels/swin_block.fused_hab_block) with its
CAB conv branch and shift masks computed by XLA and fed in window layout;
OCAB, the RHAG convs, the RRDB trunk and the upsample head stay XLA (convs
are already MXU-shaped). Inference only (drop-path off).

Correctness note on shifted blocks: the reference adds shortcut + attn +
conv_scale*conv_x in UNSHIFTED space; here the whole sum is formed in
shifted space and rolled back afterwards — rolls are permutations and the
MLP/LN2 are pointwise, so the results are identical.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

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
from ..models.hat import _overlap_windows
from .swin_block import fused_hab_block, _gelu
from .packed_heads import use_packed


def _conv3(p, x):
    return (
        jax.lax.conv_general_dilated(
            x, p["conv"]["kernel"].astype(x.dtype), (1, 1),
            padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + p["conv"]["bias"].astype(x.dtype)
    )


def _conv1(p, x):
    return x @ p["conv"]["kernel"][0, 0].astype(x.dtype) + p["conv"]["bias"].astype(x.dtype)


def _ln(p, x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + 1e-5) * p["ln"]["scale"] + p["ln"]["bias"]).astype(x.dtype)


def _dense(p, x):
    return x @ p["linear"]["kernel"].astype(x.dtype) + p["linear"]["bias"].astype(x.dtype)


def _cab(p, xn):
    y = _conv3(p["conv1"], xn)
    y = _gelu(y, xn.dtype).astype(xn.dtype)
    y = _conv3(p["conv2"], y)
    pooled = jnp.mean(y, axis=(1, 2), keepdims=True)
    att = jax.nn.relu(_conv1(p["ca"]["ca_fc1"], pooled))
    att = _conv1(p["ca"]["ca_fc2"], att)
    return y * jax.nn.sigmoid(att)


def _ocab(p, x, ws, overlap_ratio, heads):
    b, h, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    d = c // heads
    shortcut = x.reshape(b, h * w, c)
    xn = _ln(p["norm1"], x)
    qkv = _dense(p["qkv"], xn)
    q = qkv[..., :c]
    kv = qkv[..., c:]
    q_w = window_partition(q, ws).reshape(-1, ws * ws, c)
    kv_w = _overlap_windows(kv, ws, owin)
    k_w, v_w = kv_w[..., :c], kv_w[..., c:]
    bw, nq, _ = q_w.shape
    nk = k_w.shape[1]
    qh = q_w.reshape(bw, nq, heads, d).transpose(0, 2, 1, 3)
    kh = k_w.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    vh = v_w.reshape(bw, nk, heads, d).transpose(0, 2, 1, 3)
    rpb = p["relative_position_bias_table"]
    rpi = relative_position_index_oca(ws, overlap_ratio)
    bias = rpb[rpi.reshape(-1)].reshape(nq, nk, heads).transpose(2, 0, 1).astype(jnp.float32)
    out = window_attention(qh, kh, vh, bias, None, scale=d**-0.5)
    out = out.transpose(0, 2, 1, 3).reshape(bw, nq, c)
    out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w).reshape(b, h * w, c)
    y = _dense(p["proj"], out) + shortcut
    m = _dense(p["mlp"]["fc2"], _gelu(_dense(p["mlp"]["fc1"], _ln(p["norm2"], y)), y.dtype).astype(y.dtype))
    return (y + m).reshape(b, h, w, c)


def _ocab_fused(p, x, ws, overlap_ratio, heads, block_windows=16):
    """OCAB with the per-window tail (cross-attn+proj+shortcut+LN2+MLP) in
    one VMEM kernel (kernels/ocab.py). LN1, the qkv matmul and the static
    window/overlap gathers stay XLA. Exact same math as :func:`_ocab`."""
    from .ocab import fused_ocab_block

    b, h, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    d = c // heads
    xn = _ln(p["norm1"], x)
    qkv = _dense(p["qkv"], xn)
    q_w = window_partition(qkv[..., :c], ws).reshape(-1, ws * ws, c)
    kv_w = _overlap_windows(qkv[..., c:], ws, owin)
    x_w = window_partition(x, ws).reshape(-1, ws * ws, c)
    nq = ws * ws
    nk = owin * owin
    rpb = p["relative_position_bias_table"]
    rpi = relative_position_index_oca(ws, overlap_ratio)
    bias = rpb[rpi.reshape(-1)].reshape(nq, nk, heads).transpose(2, 0, 1).astype(jnp.float32)
    out_w = fused_ocab_block(
        x_w, q_w, kv_w[..., :c], kv_w[..., c:], bias,
        p["proj"]["linear"]["kernel"].astype(x.dtype),
        p["proj"]["linear"]["bias"],
        p["norm2"]["ln"]["scale"], p["norm2"]["ln"]["bias"],
        p["mlp"]["fc1"]["linear"]["kernel"].astype(x.dtype),
        p["mlp"]["fc1"]["linear"]["bias"],
        p["mlp"]["fc2"]["linear"]["kernel"].astype(x.dtype),
        p["mlp"]["fc2"]["linear"]["bias"],
        num_heads=heads, scale=d**-0.5, block_windows=block_windows,
    )
    return window_reverse(out_w.reshape(-1, ws, ws, c), ws, h, w)


def make_fused_hat(
    *,
    depths: Sequence[int] = (6, 6, 6, 6),
    num_heads: Sequence[int] = (6, 6, 6, 6),
    window_size: int = 8,
    overlap_ratio: float = 0.5,
    block_windows: int = 16,
    ocab_impl: str = "fused",  # 'fused' (kernels/ocab.py) | 'xla'
    dtype=jnp.bfloat16,
):
    """hat_fwd(params, x) for a standalone HAT with fused-HAB blocks.

    params is the HAT subtree (e.g. hybrid params['hat'] or a standalone
    HAT's params). Inference only (drop-path off).
    """
    ws = window_size
    ocab = _ocab_fused if ocab_impl == "fused" else _ocab

    def hab(p, x, heads, shift, mask_tiled, zeros_mask):
        b, h, w, c = x.shape
        d = c // heads
        rpb = p["attn"]["relative_position_bias_table"]
        rpi = relative_position_index_sa(ws)
        bias = (
            rpb[rpi.reshape(-1)].reshape(ws * ws, ws * ws, heads)
            .transpose(2, 0, 1).astype(jnp.float32)
        )
        xn = _ln(p["norm1"], x)
        conv_x = _cab(p["conv_block"], xn)
        if shift:
            xs = jnp.roll(x, (-shift, -shift), (1, 2))
            cs = jnp.roll(conv_x, (-shift, -shift), (1, 2))
            mt = mask_tiled
        else:
            xs, cs = x, conv_x
            mt = zeros_mask
        xw = window_partition(xs, ws).reshape(-1, ws * ws, c)
        cw = window_partition(cs, ws).reshape(-1, ws * ws, c)
        out = fused_hab_block(
            xw, cw, mt,
            p["norm1"]["ln"]["scale"], p["norm1"]["ln"]["bias"],
            p["attn"]["qkv"]["linear"]["kernel"].astype(dtype),
            p["attn"]["qkv"]["linear"]["bias"],
            bias,
            p["attn"]["proj"]["linear"]["kernel"].astype(dtype),
            p["attn"]["proj"]["linear"]["bias"],
            p["norm2"]["ln"]["scale"], p["norm2"]["ln"]["bias"],
            p["mlp"]["fc1"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc1"]["linear"]["bias"],
            p["mlp"]["fc2"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc2"]["linear"]["bias"],
            num_heads=heads, scale=d**-0.5, block_windows=block_windows,
        )
        y = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), (1, 2))
        return y

    def hat_fwd(params, x):
        b, h, w, _ = x.shape
        nw = (h // ws) * (w // ws)
        mask = jnp.asarray(
            np.asarray(shift_window_attn_mask(h, w, ws, ws // 2), np.float32)
        )
        mask_tiled = jnp.tile(mask, (b, 1, 1))
        zeros_mask = jnp.zeros((b * nw, ws * ws, ws * ws), jnp.float32)

        feat = _conv3(params["conv_first"], x)
        res = feat
        if "patch_norm" in params:
            res = _ln(params["patch_norm"], res)
        for i, depth in enumerate(depths):
            g = params[f"layers_{i}"]
            gin = res
            for j in range(depth):
                res = hab(
                    g[f"blocks_{j}"], res, num_heads[i],
                    0 if j % 2 == 0 else ws // 2, mask_tiled, zeros_mask,
                )
            res = ocab(g["overlap_attn"], res, ws, overlap_ratio, num_heads[i])
            res = _conv3(g["conv"], res) + gin
        res = _ln(params["norm"], res)
        feat = _conv3(params["conv_after_body"], res) + feat

        out = _conv3(params["conv_before_upsample"], feat)
        out = jnp.where(out >= 0, out, out * 0.01)
        out = _conv3(params["upsample_0"], out)
        out = pixel_shuffle(out, 2)
        return _conv3(params["conv_last"], out)

    return hat_fwd


def make_fused_hat_train(
    *,
    depths: Sequence[int] = (6, 6, 6, 6),
    num_heads: Sequence[int] = (6, 6, 6, 6),
    window_size: int = 8,
    overlap_ratio: float = 0.5,
    drop_path_rate: float = 0.1,
    block_windows: int = 16,
    dtype=jnp.bfloat16,
    fused_ocab: bool = True,
):
    """Differentiable fused-HAB HAT forward for TRAINING.

    hat_apply(params, x, deterministic, rng) — every HAB runs through the
    custom-VJP window core (kernels/hab_train.py: fused forward + split
    mlp/attention backward kernels, shift mask and per-sample drop-path
    included), and with ``fused_ocab`` each RHAG's OCAB tail runs through
    its own custom VJP (kernels/ocab_train.py). CAB, convs and the
    upsample head stay XLA and are differentiated by autodiff. Drop-path
    rates follow the reference linspace(0, drop_path_rate) over all
    blocks (hat_arch.py:761).
    """
    from .hab_train import hab_core_ad
    from .ocab_train import ocab_train

    ocab_fn = (
        (lambda p, x, ws_, ovr, heads: ocab_train(p, x, ws_, ovr, heads, block_windows))
        if fused_ocab
        else _ocab
    )

    ws = window_size
    dpr = np.linspace(0.0, drop_path_rate, int(sum(depths)))

    def hab(p, x, heads, shift, mask_tiled, zeros_mask, dp1, dp2):
        b, h, w, c = x.shape
        d = c // heads
        rpb = p["attn"]["relative_position_bias_table"]
        rpi = relative_position_index_sa(ws)
        bias = (
            rpb[rpi.reshape(-1)].reshape(ws * ws, ws * ws, heads)
            .transpose(2, 0, 1).astype(jnp.float32)
        )
        xn = _ln(p["norm1"], x)
        conv_x = _cab(p["conv_block"], xn)
        if shift:
            xs = jnp.roll(x, (-shift, -shift), (1, 2))
            cs = jnp.roll(conv_x, (-shift, -shift), (1, 2))
            mt = mask_tiled
        else:
            xs, cs = x, conv_x
            mt = zeros_mask
        xw = window_partition(xs, ws).reshape(-1, ws * ws, c)
        cw = window_partition(cs, ws).reshape(-1, ws * ws, c)
        out = hab_core_ad(
            xw, cw, mt, dp1, dp2,
            p["norm1"]["ln"]["scale"], p["norm1"]["ln"]["bias"],
            p["attn"]["qkv"]["linear"]["kernel"].astype(dtype),
            p["attn"]["qkv"]["linear"]["bias"],
            bias,
            p["attn"]["proj"]["linear"]["kernel"].astype(dtype),
            p["attn"]["proj"]["linear"]["bias"],
            p["norm2"]["ln"]["scale"], p["norm2"]["ln"]["bias"],
            p["mlp"]["fc1"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc1"]["linear"]["bias"],
            p["mlp"]["fc2"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc2"]["linear"]["bias"],
            heads, d**-0.5, 0.01, block_windows, use_packed(c, train=True),
        )
        y = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), (1, 2))
        return y

    def hat_apply(params, x, deterministic: bool = True, rng=None):
        b, h, w, _ = x.shape
        nw = (h // ws) * (w // ws)
        c = params["conv_first"]["conv"]["kernel"].shape[-1]
        mask = jnp.asarray(
            np.asarray(shift_window_attn_mask(h, w, ws, ws // 2), np.float32)
        )
        mask_tiled = jnp.tile(mask, (b, 1, 1))
        zeros_mask = jnp.zeros((b * nw, ws * ws, ws * ws), jnp.float32)
        ones_dp = jnp.ones((b * nw, 1, c), jnp.float32)

        def draw_dp(key, rate):
            keep = 1.0 - rate
            m = jax.random.bernoulli(key, keep, (b,)).astype(jnp.float32) / keep
            return jnp.repeat(m, nw)[:, None, None] * jnp.ones((1, 1, c), jnp.float32)

        feat = _conv3(params["conv_first"], x.astype(dtype))
        res = feat
        if "patch_norm" in params:
            res = _ln(params["patch_norm"], res)
        blk_idx = 0
        key = rng
        for i, depth in enumerate(depths):
            g = params[f"layers_{i}"]
            gin = res
            for j in range(depth):
                rate = float(dpr[blk_idx])
                blk_idx += 1
                if deterministic or rate == 0.0 or key is None:
                    dp1 = dp2 = ones_dp
                else:
                    key, k1, k2 = jax.random.split(key, 3)
                    dp1 = draw_dp(k1, rate)
                    dp2 = draw_dp(k2, rate)
                res = hab(
                    g[f"blocks_{j}"], res, num_heads[i],
                    0 if j % 2 == 0 else ws // 2, mask_tiled, zeros_mask,
                    dp1, dp2,
                )
            res = ocab_fn(g["overlap_attn"], res, ws, overlap_ratio, num_heads[i])
            res = _conv3(g["conv"], res) + gin
        res = _ln(params["norm"], res)
        feat = _conv3(params["conv_after_body"], res) + feat

        out = _conv3(params["conv_before_upsample"], feat)
        out = jnp.where(out >= 0, out, out * 0.01)
        out = _conv3(params["upsample_0"], out)
        out = pixel_shuffle(out, 2)
        return _conv3(params["conv_last"], out)

    return hat_apply


def make_fused_hybrid(
    *,
    depths: Sequence[int] = (6, 6, 6, 6),
    num_heads: Sequence[int] = (6, 6, 6, 6),
    window_size: int = 8,
    overlap_ratio: float = 0.5,
    num_rrdb: int = 12,
    block_windows: int = 16,
    trunk_impl: str = "cm",  # 'cm' (fused_rdb_cm; falls back to packed XLA
    #                           when trunk W % 128 != 0) | 'xla' | 'kernel' (v1)
    ocab_impl: str = "fused",
    dtype=jnp.bfloat16,
):
    """fn(params, x) for HybridHATRealESRGAN with fused-HAB backbone."""
    hat_fwd = make_fused_hat(
        depths=depths, num_heads=num_heads, window_size=window_size,
        overlap_ratio=overlap_ratio, block_windows=block_windows,
        ocab_impl=ocab_impl, dtype=dtype,
    )

    def lrelu2(x):
        return jnp.where(x >= 0, x, x * 0.2)

    def rdb(p, x):
        from ..models.hybrid import dense_block_packed

        ks = [p[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]
        bs = [p[f"conv{i}"]["conv"]["bias"] for i in range(1, 6)]
        num_feat = ks[0].shape[2]
        num_grow = ks[0].shape[3]
        return dense_block_packed(ks, bs, x, num_feat, num_grow, x.dtype)

    def rrdb(p, x):
        out = rdb(p["rdb1"], x)
        out = rdb(p["rdb2"], out)
        out = rdb(p["rdb3"], out)
        return out * 0.2 + x

    @jax.jit
    def fn(params, x):
        x = x.astype(dtype)
        hat_out = hat_fwd(params["hat"], x)
        feat = lrelu2(_conv3(params["conv_adapt"], hat_out))
        if trunk_impl == "cm" and feat.shape[2] % 128 == 0:
            from .fused_rdb_cm import fused_rrdb_trunk_cm

            trunk = fused_rrdb_trunk_cm(params, feat, num_rrdb)
        elif trunk_impl == "kernel":
            from .fused_rdb import fused_rrdb_trunk

            trunk = fused_rrdb_trunk(params, feat, num_rrdb)
        else:
            trunk = feat
            for r in range(num_rrdb):
                trunk = rrdb(params[f"rrdb_trunk_{r}"], trunk)
        feat = feat + _conv3(params["conv_body"], trunk)
        feat = lrelu2(_conv3(params["conv_up"], resize_nearest(feat, 2)))
        return _conv3(
            params["conv_last"], lrelu2(_conv3(params["conv_hr"], feat))
        )

    return fn
