"""Differentiable fused HAB: Pallas forward + split backward kernels.

Training counterpart of kernels/swin_block.fused_hab_block (reference HAB,
hat_arch.py:199-309) with the three things the inference kernel drops:
the CAB conv branch in the residual, the shift attention mask, and
per-sample drop-path on the attention and MLP branches:

    h   = x + dp1 * proj(attn(LN1(x), mask)) + conv_scale * conv_x
    out = h + dp2 * MLP(LN2(h))

The window core carries a custom VJP: forward emits h (post-attention
residual) so the MLP backward skips the attention recompute; the
attention backward recomputes the softmax with the mask and scales the
branch gradient by dp1. dp1/dp2 are (BW, 1, C) per-window multipliers
(all windows of a sample share the value, drawn per branch per block —
reference stochastic-depth semantics, mask/(1-p) scaling). conv_x, the
window/shift plumbing and the relative-position gather stay XLA and get
their gradients through ordinary autodiff.

bf16 gradient tolerance: in bf16 mode the MLP backward recomputes
LN2/GELU from the bf16-rounded saved h while the forward used the f32 h,
and the weight-grad matmuls cast f32 cotangents to bf16 — the gradients
are therefore consistent with the forward only to ~bf16 precision (a few
ulp of bf16, ~1e-2 relative worst-case). The exactness parity tests
(tests/test_fused_hat_train.py) run in fp32, where forward and recompute
coincide bit-for-bit. This is the standard mixed-precision trade; keeping
h/cotangents in f32 would roughly double the VMEM stash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_block import _gelu, _gelu_grad, _ln_f32
from .packed_heads import packed_mha, packed_mha_grads, use_packed


def _make_hab_fwd_h_kernel(num_heads: int, head_dim: int, scale: float,
                           conv_scale: float, packed: bool = False):
    c = num_heads * head_dim

    def kernel(
        x_ref, convx_ref, mask_ref, dp1_ref, dp2_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        o_ref, h_ref,
    ):
        x = x_ref[:]
        blk, n, _ = x.shape
        dt = x.dtype
        xn = _ln_f32(x, ln1s_ref[:], ln1b_ref[:]).astype(dt)
        qkv = (
            jax.lax.dot_general(
                xn.reshape(blk * n, c), wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(dt).reshape(blk, n, 3 * c)
        if packed:
            attn_out = packed_mha(
                qkv[:, :, :c], qkv[:, :, c : 2 * c], qkv[:, :, 2 * c :],
                bias_ref[:], mask_ref[:], num_heads=num_heads, scale=scale,
            )
        else:
            head_outs = []
            for i in range(num_heads):
                q = qkv[:, :, i * head_dim : (i + 1) * head_dim] * jnp.asarray(scale, dt)
                k = qkv[:, :, c + i * head_dim : c + (i + 1) * head_dim]
                v = qkv[:, :, 2 * c + i * head_dim : 2 * c + (i + 1) * head_dim]
                a = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )
                a = a + bias_ref[i].astype(jnp.float32) + mask_ref[:].astype(jnp.float32)
                a = a - jnp.max(a, axis=-1, keepdims=True)
                a = jnp.exp(a)
                a = a / jnp.sum(a, axis=-1, keepdims=True)
                head_outs.append(
                    jax.lax.dot_general(
                        a.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                )
            attn_out = jnp.concatenate(head_outs, axis=-1)
        proj = (
            jax.lax.dot_general(
                attn_out.astype(dt).reshape(blk * n, c), wproj_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + bproj_ref[:].astype(jnp.float32)
        ).reshape(blk, n, c)
        h = (
            x.astype(jnp.float32)
            + dp1_ref[:].astype(jnp.float32) * proj
            + conv_scale * convx_ref[:].astype(jnp.float32)
        )
        h_ref[:] = h.astype(h_ref.dtype)
        hn = _ln_f32(h, ln2s_ref[:], ln2b_ref[:]).astype(dt)
        u = (
            jax.lax.dot_general(
                hn.reshape(blk * n, c), w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[:].astype(jnp.float32)
        )
        m = _gelu(u, dt).astype(dt)
        m = (
            jax.lax.dot_general(
                m, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[:].astype(jnp.float32)
        ).reshape(blk, n, c)
        o_ref[:] = (h + dp2_ref[:].astype(jnp.float32) * m).astype(o_ref.dtype)

    return kernel


def _hab_bwd_mlp_kernel(
    h_ref, dout_ref, dp2_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dh_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    """MLP+LN2 backward from SAVED h with the dp2 branch scale."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in (dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    h = h_ref[:]
    dt = h.dtype
    blk, n, c = h.shape
    hf = h.astype(jnp.float32).reshape(blk * n, c)
    dout_raw = dout_ref[:].astype(jnp.float32)
    dout = (dout_raw * dp2_ref[:].astype(jnp.float32)).reshape(blk * n, c)
    eps = 1e-5

    mu2 = jnp.mean(hf, axis=-1, keepdims=True)
    var2 = jnp.mean((hf - mu2) ** 2, axis=-1, keepdims=True)
    rstd2 = jax.lax.rsqrt(var2 + eps)
    xhat2 = (hf - mu2) * rstd2
    hn = (xhat2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(jnp.float32)).astype(dt)
    u = (
        jax.lax.dot_general(
            hn, w1_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:].astype(jnp.float32)
    )
    g = _gelu(u, dt).astype(dt)

    dm = dout
    dw2_ref[...] += jax.lax.dot_general(
        g, dm.astype(dt), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(dm, axis=0)
    dg = jax.lax.dot_general(
        dm.astype(dt), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = dg * _gelu_grad(u, dt)
    dw1_ref[...] += jax.lax.dot_general(
        hn, du.astype(dt), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(du, axis=0)
    dhn = jax.lax.dot_general(
        du.astype(dt), w1_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dln2s_ref[...] += jnp.sum(dhn * xhat2, axis=0)
    dln2b_ref[...] += jnp.sum(dhn, axis=0)
    dxh2 = dhn * ln2s_ref[:].astype(jnp.float32)
    dh = rstd2 * (
        dxh2
        - jnp.mean(dxh2, axis=-1, keepdims=True)
        - xhat2 * jnp.mean(dxh2 * xhat2, axis=-1, keepdims=True)
    )
    dh_ref[:] = (dh.reshape(blk, n, c) + dout_raw).astype(dh_ref.dtype)


def _make_hab_bwd_attn_kernel(num_heads: int, head_dim: int, scale: float,
                              packed: bool = False):
    """Masked attention + LN1 backward with the dp1 branch scale.

    h = x + dp1*proj(attn(LN1 x, mask)) + conv_scale*conv_x; the conv
    branch's gradient (conv_scale * dh) is handled by the caller in XLA.
    """
    c = num_heads * head_dim

    def kernel(
        x_ref, dh_ref, mask_ref, dp1_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref,
        dx_ref, dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
        dwproj_ref, dbproj_ref,
    ):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in (
                dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
                dwproj_ref, dbproj_ref,
            ):
                r[...] = jnp.zeros_like(r)

        x = x_ref[:]
        dt = x.dtype
        blk, n, _ = x.shape
        dh_raw = dh_ref[:].astype(jnp.float32)
        dh = (dh_raw * dp1_ref[:].astype(jnp.float32)).reshape(blk * n, c)
        eps = 1e-5

        xf = x.astype(jnp.float32)
        mu1 = jnp.mean(xf, axis=-1, keepdims=True)
        var1 = jnp.mean((xf - mu1) ** 2, axis=-1, keepdims=True)
        rstd1 = jax.lax.rsqrt(var1 + eps)
        xhat1 = (xf - mu1) * rstd1
        xn = (xhat1 * ln1s_ref[:].astype(jnp.float32) + ln1b_ref[:].astype(jnp.float32)).astype(dt)
        x2d = xn.reshape(blk * n, c)
        qkv = (
            jax.lax.dot_general(
                x2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(dt).reshape(blk, n, 3 * c)

        dattn = jax.lax.dot_general(
            dh.astype(dt), wproj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, n, c)
        dbproj_ref[...] += jnp.sum(dh, axis=0)

        if packed:
            attn_out, dq, dk, dv, dbias = packed_mha_grads(
                qkv[:, :, :c], qkv[:, :, c : 2 * c], qkv[:, :, 2 * c :],
                dattn, bias_ref[:], mask_ref[:], num_heads=num_heads, scale=scale,
            )
            dbias_ref[...] += dbias
            dwproj_ref[...] += jax.lax.dot_general(
                attn_out.astype(dt).reshape(blk * n, c), dh.astype(dt),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dqkv2d = jnp.concatenate([dq, dk, dv], axis=-1).reshape(blk * n, 3 * c)
            dbqkv_ref[...] += jnp.sum(dqkv2d, axis=0)
            dwqkv_ref[...] += jax.lax.dot_general(
                x2d, dqkv2d.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dxn = jax.lax.dot_general(
                dqkv2d.astype(dt), wqkv_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(blk, n, c)
            dln1s_ref[...] += jnp.sum((dxn * xhat1).reshape(blk * n, c), axis=0)
            dln1b_ref[...] += jnp.sum(dxn.reshape(blk * n, c), axis=0)
            dxh1 = dxn * ln1s_ref[:].astype(jnp.float32)
            dx_ln = rstd1 * (
                dxh1
                - jnp.mean(dxh1, axis=-1, keepdims=True)
                - xhat1 * jnp.mean(dxh1 * xhat1, axis=-1, keepdims=True)
            )
            dx_ref[:] = (dx_ln + dh_raw).astype(dx_ref.dtype)
            return

        attn_parts = []
        dq_parts, dk_parts, dv_parts = [], [], []
        for i in range(num_heads):
            q = qkv[:, :, i * head_dim : (i + 1) * head_dim]
            k = qkv[:, :, c + i * head_dim : c + (i + 1) * head_dim]
            v = qkv[:, :, 2 * c + i * head_dim : 2 * c + (i + 1) * head_dim]
            a = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            a = a + bias_ref[i].astype(jnp.float32) + mask_ref[:].astype(jnp.float32)
            a = a - jnp.max(a, axis=-1, keepdims=True)
            a = jnp.exp(a)
            a = a / jnp.sum(a, axis=-1, keepdims=True)
            ad = a.astype(dt)
            attn_parts.append(
                jax.lax.dot_general(
                    ad, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            )
            do = dattn[:, :, i * head_dim : (i + 1) * head_dim].astype(dt)
            da = jax.lax.dot_general(
                do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            dv = jax.lax.dot_general(
                ad, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
            dbias_ref[i] += jnp.sum(ds, axis=0)
            dsd = ds.astype(dt)
            dq_parts.append(
                jax.lax.dot_general(
                    dsd, k, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
            dk_parts.append(
                jax.lax.dot_general(
                    dsd, q, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
            dv_parts.append(dv)
        attn_out = jnp.concatenate(attn_parts, axis=-1)
        dwproj_ref[...] += jax.lax.dot_general(
            attn_out.astype(dt).reshape(blk * n, c), dh.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dqkv2d = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1).reshape(
            blk * n, 3 * c
        )
        dbqkv_ref[...] += jnp.sum(dqkv2d, axis=0)
        dwqkv_ref[...] += jax.lax.dot_general(
            x2d, dqkv2d.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxn = jax.lax.dot_general(
            dqkv2d.astype(dt), wqkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, n, c)
        dln1s_ref[...] += jnp.sum((dxn * xhat1).reshape(blk * n, c), axis=0)
        dln1b_ref[...] += jnp.sum(dxn.reshape(blk * n, c), axis=0)
        dxh1 = dxn * ln1s_ref[:].astype(jnp.float32)
        dx_ln = rstd1 * (
            dxh1
            - jnp.mean(dxh1, axis=-1, keepdims=True)
            - xhat1 * jnp.mean(dxh1 * xhat1, axis=-1, keepdims=True)
        )
        dx_ref[:] = (dx_ln + dh_raw).astype(dx_ref.dtype)

    return kernel


def _tile(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _wspec(blk, n, c):
    return pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)


def _pick_blk(bw, target):
    blk = min(target, bw)
    while bw % blk:
        blk -= 1
    return blk


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "scale", "conv_scale", "block_windows", "packed"),
)
def _hab_fwd_h(
    x_w, convx_w, mask, dp1, dp2,
    ln1s, ln1b, wqkv, bqkv, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    *, num_heads, scale, conv_scale, block_windows=16, packed=False,
):
    bw, n, c = x_w.shape
    hidden = w1.shape[1]
    blk = _pick_blk(bw, block_windows)
    kern = _make_hab_fwd_h_kernel(num_heads, c // num_heads, scale, conv_scale, packed)
    return pl.pallas_call(
        kern,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), x_w.dtype),
            jax.ShapeDtypeStruct((bw, n, c), x_w.dtype),
        ),
        in_specs=[
            _wspec(blk, n, c), _wspec(blk, n, c),
            pl.BlockSpec((blk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _wspec(blk, 1, c), _wspec(blk, 1, c),
            _tile((c,)), _tile((c,)), _tile((c, 3 * c)), _tile((3 * c,)),
            _tile((num_heads, n, n)), _tile((c, c)), _tile((c,)),
            _tile((c,)), _tile((c,)), _tile((c, hidden)), _tile((hidden,)),
            _tile((hidden, c)), _tile((c,)),
        ],
        out_specs=(_wspec(blk, n, c), _wspec(blk, n, c)),
    )(x_w, convx_w, mask, dp1, dp2, ln1s, ln1b, wqkv, bqkv, bias,
      wproj, bproj, ln2s, ln2b, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("block_windows",))
def _hab_bwd_mlp(h, dout, dp2, ln2s, ln2b, w1, b1, w2, b2, *, block_windows=16):
    bw, n, c = h.shape
    hidden = w1.shape[1]
    blk = _pick_blk(bw, block_windows)
    f32 = jnp.float32
    return pl.pallas_call(
        _hab_bwd_mlp_kernel,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), h.dtype),
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, hidden), f32), jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, c), f32), jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            _wspec(blk, n, c), _wspec(blk, n, c), _wspec(blk, 1, c),
            _tile((c,)), _tile((c,)), _tile((c, hidden)), _tile((hidden,)),
            _tile((hidden, c)), _tile((c,)),
        ],
        out_specs=(
            _wspec(blk, n, c),
            _tile((c,)), _tile((c,)), _tile((c, hidden)), _tile((hidden,)),
            _tile((hidden, c)), _tile((c,)),
        ),
    )(h, dout, dp2, ln2s, ln2b, w1, b1, w2, b2)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "packed")
)
def _hab_bwd_attn(
    x_w, dh, mask, dp1, ln1s, ln1b, wqkv, bqkv, bias, wproj,
    *, num_heads, scale, block_windows=8, packed=False,
):
    bw, n, c = x_w.shape
    blk = _pick_blk(bw, block_windows)
    kern = _make_hab_bwd_attn_kernel(num_heads, c // num_heads, scale, packed)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), x_w.dtype),
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32), jax.ShapeDtypeStruct((3 * c,), f32),
            jax.ShapeDtypeStruct((num_heads, n, n), f32),
            jax.ShapeDtypeStruct((c, c), f32), jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            _wspec(blk, n, c), _wspec(blk, n, c),
            pl.BlockSpec((blk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            _wspec(blk, 1, c),
            _tile((c,)), _tile((c,)), _tile((c, 3 * c)), _tile((3 * c,)),
            _tile((num_heads, n, n)), _tile((c, c)),
        ],
        out_specs=(
            _wspec(blk, n, c),
            _tile((c,)), _tile((c,)), _tile((c, 3 * c)), _tile((3 * c,)),
            _tile((num_heads, n, n)), _tile((c, c)), _tile((c,)),
        ),
    )(x_w, dh, mask, dp1, ln1s, ln1b, wqkv, bqkv, bias, wproj)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(18, 19, 20, 21, 22)
)
def hab_core_ad(
    x_w, convx_w, mask, dp1, dp2,
    ln1s, ln1b, wqkv, bqkv, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    num_heads, scale, conv_scale, block_windows, packed=False,
):
    out, _ = _hab_fwd_h(
        x_w, convx_w, mask, dp1, dp2, ln1s, ln1b, wqkv, bqkv, bias,
        wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale, conv_scale=conv_scale,
        block_windows=block_windows, packed=packed,
    )
    return out


def _hab_ad_fwd(
    x_w, convx_w, mask, dp1, dp2,
    ln1s, ln1b, wqkv, bqkv, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    num_heads, scale, conv_scale, block_windows, packed=False,
):
    out, h = _hab_fwd_h(
        x_w, convx_w, mask, dp1, dp2, ln1s, ln1b, wqkv, bqkv, bias,
        wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale, conv_scale=conv_scale,
        block_windows=block_windows, packed=packed,
    )
    res = (x_w, convx_w, h, mask, dp1, dp2, ln1s, ln1b, wqkv, bqkv, bias,
           wproj, bproj, ln2s, ln2b, w1, b1, w2, b2)
    return out, res


def _hab_ad_bwd(num_heads, scale, conv_scale, block_windows, packed, res, dout):
    (x_w, convx_w, h, mask, dp1, dp2, ln1s, ln1b, wqkv, bqkv, bias,
     wproj, bproj, ln2s, ln2b, w1, b1, w2, b2) = res
    dh, dln2s, dln2b, dw1, db1, dw2, db2 = _hab_bwd_mlp(
        h, dout, dp2, ln2s, ln2b, w1, b1, w2, b2,
        block_windows=min(block_windows, 16),
    )
    dx, dln1s, dln1b, dwqkv, dbqkv, dbias, dwproj, dbproj = _hab_bwd_attn(
        x_w, dh, mask, dp1, ln1s, ln1b, wqkv, bqkv, bias, wproj,
        num_heads=num_heads, scale=scale,
        block_windows=min(block_windows, 8), packed=packed,
    )
    dconvx = (conv_scale * dh.astype(jnp.float32)).astype(convx_w.dtype)
    cast = lambda gr, ref: gr.astype(ref.dtype)  # noqa: E731
    return (
        dx, dconvx,
        jnp.zeros_like(mask), jnp.zeros_like(dp1), jnp.zeros_like(dp2),
        cast(dln1s, ln1s), cast(dln1b, ln1b),
        cast(dwqkv, wqkv), cast(dbqkv, bqkv), cast(dbias, bias),
        cast(dwproj, wproj), cast(dbproj, bproj),
        cast(dln2s, ln2s), cast(dln2b, ln2b),
        cast(dw1, w1), cast(db1, b1), cast(dw2, w2), cast(db2, b2),
    )


hab_core_ad.defvjp(_hab_ad_fwd, _hab_ad_bwd)
