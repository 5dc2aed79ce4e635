"""Differentiable fused OCAB tail: Pallas forward + backward kernels.

Training counterpart of kernels/ocab.py (reference OCAB,
hat_arch/hat_arch.py:352-438). Like the inference kernel, XLA keeps the
parts it is already good at — LN1, the wide qkv matmul, the static
window/overlap gathers, and (via autodiff through this custom VJP's
dq/dk/dv outputs) their backward — while the per-window tail

    h   = x + proj(cross_attn(q, k, v, bias))
    out = h + MLP(LN2(h))

runs fused in VMEM in BOTH directions. The forward emits h (the
post-shortcut residual) so the MLP backward skips the attention
recompute; the attention backward recomputes the softmax from the saved
q/k/v windows. The MLP+LN2 backward is shared with the HAB training core
(kernels/hab_train._hab_bwd_mlp with a unit branch scale — OCAB has no
drop-path on its branches, hat_arch.py:418-437).

bf16 gradient tolerance: identical to hab_train (LN2/GELU recomputed from
the bf16-rounded saved h; weight-grad matmuls cast f32 cotangents to
bf16). Exactness parity vs XLA autodiff is tested in fp32
(tests/test_fused_hat_train.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_block import _gelu, _ln_f32
from .hab_train import _hab_bwd_mlp, _tile, _pick_blk, _wspec
from .packed_heads import packed_mha, packed_mha_grads, use_packed


def _make_ocab_fwd_h_kernel(num_heads: int, head_dim: int, scale: float,
                            packed: bool = False):
    c = num_heads * head_dim

    def kernel(
        x_ref,        # (BLK, NQ, C)  shortcut windows
        q_ref,        # (BLK, NQ, C)
        k_ref,        # (BLK, NK, C)
        v_ref,        # (BLK, NK, C)
        bias_ref,     # (heads, NQ, NK) fp32
        wproj_ref, bproj_ref,
        ln2s_ref, ln2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        o_ref, h_ref,
    ):
        x = x_ref[:]
        blk, nq, _ = x.shape
        dt = x.dtype
        q_all, k_all, v_all = q_ref[:], k_ref[:], v_ref[:]

        if packed:
            attn_out = packed_mha(
                q_all, k_all, v_all, bias_ref[:], None,
                num_heads=num_heads, scale=scale,
            )
        else:
            head_outs = []
            for i in range(num_heads):
                sl = slice(i * head_dim, (i + 1) * head_dim)
                q = q_all[:, :, sl] * jnp.asarray(scale, dt)
                k = k_all[:, :, sl]
                v = v_all[:, :, sl]
                a = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )
                a = a + bias_ref[i].astype(jnp.float32)
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
                attn_out.astype(dt).reshape(blk * nq, c), wproj_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + bproj_ref[:].astype(jnp.float32)
        )
        h = x.astype(jnp.float32).reshape(blk * nq, c) + proj
        h_ref[:] = h.reshape(blk, nq, c).astype(h_ref.dtype)

        hn = _ln_f32(h.reshape(blk, nq, c), ln2s_ref[:], ln2b_ref[:]).astype(dt)
        m = (
            jax.lax.dot_general(
                hn.reshape(blk * nq, c), w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[:].astype(jnp.float32)
        )
        m = _gelu(m, dt).astype(dt)
        m = (
            jax.lax.dot_general(
                m, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[:].astype(jnp.float32)
        )
        o_ref[:] = (h + m).reshape(blk, nq, c).astype(dt)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "packed")
)
def _ocab_fwd_h(
    x_w, q_w, k_w, v_w, bias,
    wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    *, num_heads, scale, block_windows=16, packed=False,
):
    bw, nq, c = x_w.shape
    nk = k_w.shape[1]
    hidden = w1.shape[1]
    blk = _pick_blk(bw, block_windows)
    kern = _make_ocab_fwd_h_kernel(num_heads, c // num_heads, scale, packed)
    return pl.pallas_call(
        kern,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, nq, c), x_w.dtype),
            jax.ShapeDtypeStruct((bw, nq, c), x_w.dtype),
        ),
        in_specs=[
            _wspec(blk, nq, c), _wspec(blk, nq, c),
            _wspec(blk, nk, c), _wspec(blk, nk, c),
            _tile((num_heads, nq, nk)),
            _tile((c, c)), _tile((c,)),
            _tile((c,)), _tile((c,)),
            _tile((c, hidden)), _tile((hidden,)),
            _tile((hidden, c)), _tile((c,)),
        ],
        out_specs=(_wspec(blk, nq, c), _wspec(blk, nq, c)),
    )(x_w, q_w, k_w, v_w, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2)


def _make_ocab_bwd_attn_kernel(num_heads: int, head_dim: int, scale: float,
                               packed: bool = False):
    """Cross-attention + proj backward from saved q/k/v windows.

    h = x + proj(attn) ⇒ dx = dh (handled by the caller); this kernel
    produces dq/dk/dv (autodiff carries them through qkv/LN1/gathers in
    XLA) and the proj/bias weight grads, accumulated across grid steps.
    """
    c = num_heads * head_dim

    def kernel(
        q_ref, k_ref, v_ref, dh_ref, bias_ref, wproj_ref,
        dq_ref, dk_ref, dv_ref, dbias_ref, dwproj_ref, dbproj_ref,
    ):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in (dbias_ref, dwproj_ref, dbproj_ref):
                r[...] = jnp.zeros_like(r)

        q_all, k_all, v_all = q_ref[:], k_ref[:], v_ref[:]
        dt = q_all.dtype
        blk, nq, _ = q_all.shape
        dh = dh_ref[:].astype(jnp.float32).reshape(blk * nq, c)

        dattn = jax.lax.dot_general(
            dh.astype(dt), wproj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, nq, c)
        dbproj_ref[...] += jnp.sum(dh, axis=0)

        if packed:
            attn_out, dq, dk, dv, dbias = packed_mha_grads(
                q_all, k_all, v_all, dattn, bias_ref[:], None,
                num_heads=num_heads, scale=scale,
            )
            dbias_ref[...] += dbias
            dwproj_ref[...] += jax.lax.dot_general(
                attn_out.astype(dt).reshape(blk * nq, c), dh.astype(dt),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            dq_ref[:] = dq.astype(dq_ref.dtype)
            dk_ref[:] = dk.astype(dk_ref.dtype)
            dv_ref[:] = dv.astype(dv_ref.dtype)
            return

        attn_parts, dq_parts, dk_parts, dv_parts = [], [], [], []
        for i in range(num_heads):
            sl = slice(i * head_dim, (i + 1) * head_dim)
            q = q_all[:, :, sl]
            k = k_all[:, :, sl]
            v = v_all[:, :, sl]
            a = jax.lax.dot_general(
                q * jnp.asarray(scale, dt), k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            a = a + bias_ref[i].astype(jnp.float32)
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
            do = dattn[:, :, sl].astype(dt)
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
            attn_out.astype(dt).reshape(blk * nq, c), dh.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dq_ref[:] = jnp.concatenate(dq_parts, axis=-1).astype(dq_ref.dtype)
        dk_ref[:] = jnp.concatenate(dk_parts, axis=-1).astype(dk_ref.dtype)
        dv_ref[:] = jnp.concatenate(dv_parts, axis=-1).astype(dv_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "packed")
)
def _ocab_bwd_attn(
    q_w, k_w, v_w, dh, bias, wproj, *, num_heads, scale, block_windows=8,
    packed=False,
):
    bw, nq, c = q_w.shape
    nk = k_w.shape[1]
    blk = _pick_blk(bw, block_windows)
    kern = _make_ocab_bwd_attn_kernel(num_heads, c // num_heads, scale, packed)
    f32 = jnp.float32
    return pl.pallas_call(
        kern,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, nq, c), q_w.dtype),
            jax.ShapeDtypeStruct((bw, nk, c), k_w.dtype),
            jax.ShapeDtypeStruct((bw, nk, c), v_w.dtype),
            jax.ShapeDtypeStruct((num_heads, nq, nk), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            _wspec(blk, nq, c), _wspec(blk, nk, c), _wspec(blk, nk, c),
            _wspec(blk, nq, c),
            _tile((num_heads, nq, nk)), _tile((c, c)),
        ],
        out_specs=(
            _wspec(blk, nq, c), _wspec(blk, nk, c), _wspec(blk, nk, c),
            _tile((num_heads, nq, nk)), _tile((c, c)), _tile((c,)),
        ),
    )(q_w, k_w, v_w, dh, bias, wproj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16))
def ocab_tail_ad(
    x_w, q_w, k_w, v_w, bias,
    wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    num_heads, scale, block_windows, packed=False,
):
    out, _ = _ocab_fwd_h(
        x_w, q_w, k_w, v_w, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale, block_windows=block_windows,
        packed=packed,
    )
    return out


def _ocab_ad_fwd(
    x_w, q_w, k_w, v_w, bias,
    wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
    num_heads, scale, block_windows, packed=False,
):
    out, h = _ocab_fwd_h(
        x_w, q_w, k_w, v_w, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale, block_windows=block_windows,
        packed=packed,
    )
    res = (q_w, k_w, v_w, h, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2)
    return out, res


def _ocab_ad_bwd(num_heads, scale, block_windows, packed, res, dout):
    q_w, k_w, v_w, h, bias, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2 = res
    bw, nq, c = q_w.shape
    ones_dp = jnp.ones((bw, 1, c), jnp.float32)  # OCAB branches have no drop-path
    dh, dln2s, dln2b, dw1, db1, dw2, db2 = _hab_bwd_mlp(
        h, dout, ones_dp, ln2s, ln2b, w1, b1, w2, b2,
        block_windows=min(block_windows, 16),
    )
    dq, dk, dv, dbias, dwproj, dbproj = _ocab_bwd_attn(
        q_w, k_w, v_w, dh, bias, wproj,
        num_heads=num_heads, scale=scale, block_windows=min(block_windows, 8),
        packed=packed,
    )
    cast = lambda gr, ref: gr.astype(ref.dtype)  # noqa: E731
    dx = dh  # h = x + proj(attn): the shortcut passes dh through unchanged
    return (
        dx, dq, dk, dv, cast(dbias, bias),
        cast(dwproj, wproj), cast(dbproj, bproj),
        cast(dln2s, ln2s), cast(dln2b, ln2b),
        cast(dw1, w1), cast(db1, b1), cast(dw2, w2), cast(db2, b2),
    )


ocab_tail_ad.defvjp(_ocab_ad_fwd, _ocab_ad_bwd)


def ocab_train(p, x, ws, overlap_ratio, heads, block_windows=16):
    """Differentiable OCAB with the fused per-window tail.

    Same plumbing as fused_hat._ocab_fused (LN1 + qkv + gathers in XLA,
    tail in VMEM) but through the custom VJP, so the backward also runs
    the Pallas kernels. Drop-in replacement for fused_hat._ocab inside
    make_fused_hat_train.
    """
    from .fused_hat import _ln, _dense
    from ..models.hat import _overlap_windows
    from ..ops import (
        window_partition,
        window_reverse,
        relative_position_index_oca,
    )

    b, h, w, c = x.shape
    owin = int(ws * overlap_ratio) + ws
    d = c // heads
    xn = _ln(p["norm1"], x)
    qkv = _dense(p["qkv"], xn)
    q_w = window_partition(qkv[..., :c], ws).reshape(-1, ws * ws, c)
    kv_w = _overlap_windows(qkv[..., c:], ws, owin)
    x_w = window_partition(x, ws).reshape(-1, ws * ws, c)
    nq, nk = ws * ws, owin * owin
    rpb = p["relative_position_bias_table"]
    rpi = relative_position_index_oca(ws, overlap_ratio)
    bias = rpb[rpi.reshape(-1)].reshape(nq, nk, heads).transpose(2, 0, 1).astype(jnp.float32)
    out_w = ocab_tail_ad(
        x_w, q_w, kv_w[..., :c], kv_w[..., c:], bias,
        p["proj"]["linear"]["kernel"].astype(x.dtype),
        p["proj"]["linear"]["bias"],
        p["norm2"]["ln"]["scale"], p["norm2"]["ln"]["bias"],
        p["mlp"]["fc1"]["linear"]["kernel"].astype(x.dtype),
        p["mlp"]["fc1"]["linear"]["bias"],
        p["mlp"]["fc2"]["linear"]["kernel"].astype(x.dtype),
        p["mlp"]["fc2"]["linear"]["bias"],
        heads, d**-0.5, block_windows, use_packed(c, train=True),
    )
    return window_reverse(out_w.reshape(-1, ws, ws, c), ws, h, w)
