"""Fused SwinTransformerBlock kernel — the whole block in VMEM.

One pallas_call per block computes LN1 -> QKV -> per-head window attention
(+ relative-position bias) -> proj -> residual -> LN2 -> MLP -> residual
for a tile of windows, with every intermediate living in VMEM. The XLA
path materializes ~6 HBM-round-trip intermediates per block and launches
each op separately; here HBM traffic is x-in + out + (streamed) weights.

Operates on PRE-PARTITIONED windows (Bw, N, C) — cyclic rolls and window
partition/reverse commute with LayerNorm and stay outside (they are pure
data movement XLA handles between blocks). No shift mask (SwinIR's
documented deviation); HAT-style masked blocks keep the unfused path.

Numerics: matmuls in the input dtype (bf16 fast path) with fp32
accumulation; LayerNorm / softmax chains in fp32 — matching the unfused
reference path to ~1e-2 in bf16 and ~1e-5 in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7) — the
    exact-GELU path inside the kernel (pallas TPU cannot lower erf/erfc)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    return xf * 0.5 * (1.0 + _erf_approx(xf * (2.0**-0.5)))


# bf16 kernels use the tanh GELU: the A&S erf path spends an exp + a
# divide (both EUP transcendentals) + a 5-term poly per element on the
# (tile*64, hidden) tensor — measured 0.42 ms/block of the flagship's
# 3.35 ms (scripts/swin_stage_ablation.py 'mlp_nogelu' vs 'full'); tanh
# is one EUP op and saves ~0.38 ms/block. Max abs deviation from exact
# GELU is 4.7e-4 — comparable to the bf16 output cast's own rounding —
# and the measured end-to-end bf16-vs-fp32-reference deviation is
# unchanged (see PERF.md round 3). fp32 kernels (the parity/test path)
# keep the exact erf; flip FAST_GELU_BF16 before tracing to A/B.
FAST_GELU_BF16 = True


def _gelu_fast(x):
    xf = x.astype(jnp.float32)
    s = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    return 0.5 * xf * (1.0 + jnp.tanh(s))


def _gelu(x, dt):
    """Activation for a kernel whose io dtype is ``dt`` (input x is f32)."""
    if dt == jnp.bfloat16 and FAST_GELU_BF16:
        return _gelu_fast(x)
    return _gelu_exact(x)


def _gelu_grad(u, dt):
    """d gelu(u) / du, matching the forward variant chosen by ``dt``."""
    uf = u.astype(jnp.float32)
    if dt == jnp.bfloat16 and FAST_GELU_BF16:
        s = 0.7978845608028654 * (uf + 0.044715 * uf * uf * uf)
        t = jnp.tanh(s)
        ds = 0.7978845608028654 * (1.0 + 3.0 * 0.044715 * uf * uf)
        return 0.5 * (1.0 + t) + 0.5 * uf * (1.0 - t * t) * ds
    phi = jnp.exp(-0.5 * uf * uf) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    Phi = 0.5 * (1.0 + _erf_approx(uf * (2.0**-0.5)))
    return Phi + uf * phi


def _ln_f32(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32
    )


def _make_kernel(num_heads: int, head_dim: int, scale: float,
                 packed: bool = False):
    """Fused swin block (inference): LN1 -> W-MSA (+rel-pos bias, NO shift
    mask — architecture_swin.py:138 deviation) -> proj -> +x -> LN2 -> MLP.
    With ``packed`` the per-head attention dots become grouped block-
    diagonal dots (kernels/packed_heads.py): at the flagship head_dim 30
    the best grouping is pairs of heads (M=128, K=60), halving the
    attention tile-passes vs the per-head loop."""
    c = num_heads * head_dim

    def kernel(
        x_ref,        # (BLK, N, C)
        ln1s_ref, ln1b_ref,           # (C,)
        wqkv_ref, bqkv_ref,           # (C, 3C), (3C,)
        bias_ref,                     # (heads, N, N) fp32
        wproj_ref, bproj_ref,         # (C, C), (C,)
        ln2s_ref, ln2b_ref,           # (C,)
        w1_ref, b1_ref,               # (C, H), (H,)
        w2_ref, b2_ref,               # (H, C), (C,)
        o_ref,                        # (BLK, N, C)
    ):
        x = x_ref[:]                  # (BLK, N, C)
        blk, n, _ = x.shape
        dt = x.dtype

        xn = _ln_f32(x, ln1s_ref[:], ln1b_ref[:]).astype(dt)
        x2d = xn.reshape(blk * n, c)
        qkv = (
            jax.lax.dot_general(
                x2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(dt)
        qkv = qkv.reshape(blk, n, 3 * c)

        if packed:
            from .packed_heads import packed_mha

            attn_out = packed_mha(
                qkv[:, :, :c], qkv[:, :, c : 2 * c], qkv[:, :, 2 * c :],
                bias_ref[:], None, num_heads=num_heads, scale=scale,
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
                a = a + bias_ref[i].astype(jnp.float32)
                a = a - jnp.max(a, axis=-1, keepdims=True)
                a = jnp.exp(a)
                a = a / jnp.sum(a, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    a.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                head_outs.append(o)
            attn_out = jnp.concatenate(head_outs, axis=-1)

        proj = (
            jax.lax.dot_general(
                attn_out.astype(dt).reshape(blk * n, c), wproj_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + bproj_ref[:].astype(jnp.float32)
        )
        h = x.astype(jnp.float32).reshape(blk * n, c) + proj  # residual 1

        hn = _ln_f32(h.astype(dt).reshape(blk, n, c), ln2s_ref[:], ln2b_ref[:]).astype(dt)
        m = (
            jax.lax.dot_general(
                hn.reshape(blk * n, c), w1_ref[:], (((1,), (0,)), ((), ())),
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
        out = h + m  # residual 2
        o_ref[:] = out.reshape(blk, n, c).astype(dt)

    return kernel


def _make_hab_kernel(num_heads: int, head_dim: int, scale: float, conv_scale: float,
                     packed: bool = False):
    """HAB forward (hat_arch.py:199-309) as one VMEM kernel: LN1 -> masked
    W-MSA (+rel-pos bias) -> proj -> + x + conv_scale*conv_x -> LN2 -> MLP.
    The CAB conv branch (spatial 3x3s) is computed by XLA outside and fed
    in window layout; the shift mask comes pre-tiled per window. With
    ``packed`` the per-head loop becomes block-diagonal head-packed dots
    (kernels/packed_heads.py) — bit-identical, half the MXU passes at
    HAT's head_dim 15."""
    c = num_heads * head_dim

    def kernel(
        x_ref, convx_ref, mask_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        o_ref,
    ):
        x = x_ref[:]
        blk, n, _ = x.shape
        dt = x.dtype
        xn = _ln_f32(x, ln1s_ref[:], ln1b_ref[:]).astype(dt)
        x2d = xn.reshape(blk * n, c)
        qkv = (
            jax.lax.dot_general(
                x2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(dt).reshape(blk, n, 3 * c)
        if packed:
            from .packed_heads import packed_mha

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
                a = a + bias_ref[i].astype(jnp.float32)
                a = a + mask_ref[:].astype(jnp.float32)
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
        )
        h = (
            x.astype(jnp.float32).reshape(blk * n, c)
            + proj
            + conv_scale * convx_ref[:].astype(jnp.float32).reshape(blk * n, c)
        )
        hn = _ln_f32(h.astype(dt).reshape(blk, n, c), ln2s_ref[:], ln2b_ref[:]).astype(dt)
        m = (
            jax.lax.dot_general(
                hn.reshape(blk * n, c), w1_ref[:], (((1,), (0,)), ((), ())),
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
        o_ref[:] = (h + m).reshape(blk, n, c).astype(dt)

    return kernel


def fused_hab_block(
    x_windows, convx_windows, mask_tiled,
    ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    *,
    num_heads: int,
    scale: float,
    conv_scale: float = 0.01,
    block_windows: int = 16,
    packed: bool | None = None,
):
    """Fused HAB (inference). mask_tiled: (Bw, N, N) additive shift mask
    (zeros for unshifted blocks). packed=None defers to
    packed_heads.use_packed (default: packed on TPU — on-chip A/B'd —
    per-head loop elsewhere; SRDEF_PACKED overrides)."""
    bw, n, c = x_windows.shape
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    hidden = w1.shape[1]
    if packed is None:
        from .packed_heads import use_packed

        packed = use_packed(c)
    kernel = _make_hab_kernel(num_heads, head_dim, scale, conv_scale, packed)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    blk_spec = pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bw // blk,),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
        in_specs=[
            blk_spec, blk_spec,
            pl.BlockSpec((blk, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)), tile((c, c)), tile((c,)),
            tile((c,)), tile((c,)), tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ],
        out_specs=blk_spec,
    )(
        x_windows, convx_windows, mask_tiled,
        ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    )


def _make_kernel_fwd_h(num_heads: int, head_dim: int, scale: float,
                       packed: bool = False):
    """Forward that also emits h (the post-attention residual) so the split
    backward skips recomputing the attention for the MLP half."""
    c = num_heads * head_dim

    def kernel(
        x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        o_ref, h_ref,
    ):
        x = x_ref[:]
        blk, n, _ = x.shape
        dt = x.dtype
        xn = _ln_f32(x, ln1s_ref[:], ln1b_ref[:]).astype(dt)
        x2d = xn.reshape(blk * n, c)
        qkv = (
            jax.lax.dot_general(
                x2d, wqkv_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[:].astype(jnp.float32)
        ).astype(dt).reshape(blk, n, 3 * c)
        if packed:
            from .packed_heads import packed_mha

            attn_out = packed_mha(
                qkv[:, :, :c], qkv[:, :, c : 2 * c], qkv[:, :, 2 * c :],
                bias_ref[:], None, num_heads=num_heads, scale=scale,
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
                attn_out.astype(dt).reshape(blk * n, c), wproj_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + bproj_ref[:].astype(jnp.float32)
        )
        h = x.astype(jnp.float32).reshape(blk, n, c) + proj.reshape(blk, n, c)
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
        )
        o_ref[:] = (h.reshape(blk * n, c) + m).reshape(blk, n, c).astype(o_ref.dtype)

    return kernel


def _bwd_mlp_kernel(
    h_ref, dout_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    dh_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
):
    """MLP+LN2 backward from the SAVED h — no attention recompute."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for r in (dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    h = h_ref[:]
    dt = h.dtype
    blk, n, c = h.shape
    hf = h.astype(jnp.float32).reshape(blk * n, c)
    dout = dout_ref[:].astype(jnp.float32).reshape(blk * n, c)
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
    dh_ref[:] = (dh + dout).reshape(blk, n, c).astype(dh_ref.dtype)


def _make_bwd_attn_kernel(num_heads: int, head_dim: int, scale: float,
                          packed: bool = False):
    """Attention+LN1 backward given dh (grad at the residual-1 output)."""
    c = num_heads * head_dim

    def kernel(
        x_ref, dh_ref,
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
        dh = dh_ref[:].astype(jnp.float32).reshape(blk * n, c)
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
            from .packed_heads import packed_mha_grads

            attn_out, dq, dk, dv, dbias = packed_mha_grads(
                qkv[:, :, :c], qkv[:, :, c : 2 * c], qkv[:, :, 2 * c :],
                dattn, bias_ref[:], None, num_heads=num_heads, scale=scale,
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
            dx_ref[:] = (dx_ln + dh.reshape(blk, n, c)).astype(dx_ref.dtype)
            return

        # one pass per head: recompute a, grads, and the head's attn output
        # (needed for dWproj) without keeping every head's a live
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
        dx_ref[:] = (dx_ln + dh.reshape(blk, n, c)).astype(dx_ref.dtype)

    return kernel


def _make_bwd_kernel(num_heads: int, head_dim: int, scale: float):
    """Backward of the fused block: recomputes the forward in VMEM, then
    chains gradients. Weight/bias/LN/bias-table grads accumulate across
    grid steps into revisited output blocks (sequential TPU grid)."""
    c = num_heads * head_dim

    def kernel(
        x_ref, dout_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
        w1_ref, b1_ref, w2_ref, b2_ref,
        # outputs
        dx_ref,
        dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
        dwproj_ref, dbproj_ref, dln2s_ref, dln2b_ref,
        dw1_ref, db1_ref, dw2_ref, db2_ref,
    ):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _init():
            for r in (
                dln1s_ref, dln1b_ref, dwqkv_ref, dbqkv_ref, dbias_ref,
                dwproj_ref, dbproj_ref, dln2s_ref, dln2b_ref,
                dw1_ref, db1_ref, dw2_ref, db2_ref,
            ):
                r[...] = jnp.zeros_like(r)

        x = x_ref[:]
        dt = x.dtype
        blk, n, _ = x.shape
        dout = dout_ref[:].astype(jnp.float32).reshape(blk * n, c)
        eps = 1e-5

        # ---- recompute forward (keep fp32 stats) --------------------------
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

        heads_a = []
        heads_o = []
        for i in range(num_heads):
            q = qkv[:, :, i * head_dim : (i + 1) * head_dim] * jnp.asarray(scale, dt)
            k = qkv[:, :, c + i * head_dim : c + (i + 1) * head_dim]
            v = qkv[:, :, 2 * c + i * head_dim : 2 * c + (i + 1) * head_dim]
            a = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            a = a + bias_ref[i].astype(jnp.float32)
            a = a - jnp.max(a, axis=-1, keepdims=True)
            a = jnp.exp(a)
            a = a / jnp.sum(a, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                a.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            heads_a.append(a)
            heads_o.append(o)
        attn_out = jnp.concatenate(heads_o, axis=-1)  # (blk, n, c) f32

        proj = (
            jax.lax.dot_general(
                attn_out.astype(dt).reshape(blk * n, c), wproj_ref[:],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            + bproj_ref[:].astype(jnp.float32)
        )
        h = xf.reshape(blk * n, c) + proj

        mu2 = jnp.mean(h, axis=-1, keepdims=True)
        var2 = jnp.mean((h - mu2) ** 2, axis=-1, keepdims=True)
        rstd2 = jax.lax.rsqrt(var2 + eps)
        xhat2 = (h - mu2) * rstd2
        hn = (xhat2 * ln2s_ref[:].astype(jnp.float32) + ln2b_ref[:].astype(jnp.float32)).astype(dt)

        u = (
            jax.lax.dot_general(
                hn, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[:].astype(jnp.float32)
        )
        g = _gelu(u, dt).astype(dt)

        # ---- backward ------------------------------------------------------
        # out = h + g @ W2 + b2
        dm = dout                                   # (BN, C) f32
        dw2_ref[...] += jax.lax.dot_general(
            g, dm.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db2_ref[...] += jnp.sum(dm, axis=0)
        dg = jax.lax.dot_general(
            dm.astype(dt), w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        du = dg * _gelu_grad(u, dt)
        dw1_ref[...] += jax.lax.dot_general(
            hn, du.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[...] += jnp.sum(du, axis=0)
        dhn = jax.lax.dot_general(
            du.astype(dt), w1_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # LN2 backward
        dln2s_ref[...] += jnp.sum(dhn * xhat2, axis=0)
        dln2b_ref[...] += jnp.sum(dhn, axis=0)
        dxh2 = dhn * ln2s_ref[:].astype(jnp.float32)
        dh = rstd2 * (
            dxh2
            - jnp.mean(dxh2, axis=-1, keepdims=True)
            - xhat2 * jnp.mean(dxh2 * xhat2, axis=-1, keepdims=True)
        )
        dh = dh + dout                               # residual 2

        # proj backward
        dbproj_ref[...] += jnp.sum(dh, axis=0)
        dwproj_ref[...] += jax.lax.dot_general(
            attn_out.astype(dt).reshape(blk * n, c), dh.astype(dt),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        dattn = jax.lax.dot_general(
            dh.astype(dt), wproj_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, n, c)

        # attention backward per head
        dq_parts, dk_parts, dv_parts = [], [], []
        for i in range(num_heads):
            a = heads_a[i]                           # (blk, n, n) f32
            v = qkv[:, :, 2 * c + i * head_dim : 2 * c + (i + 1) * head_dim]
            q = qkv[:, :, i * head_dim : (i + 1) * head_dim]
            k = qkv[:, :, c + i * head_dim : c + (i + 1) * head_dim]
            do = dattn[:, :, i * head_dim : (i + 1) * head_dim].astype(dt)
            da = jax.lax.dot_general(
                do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            dv = jax.lax.dot_general(
                a.astype(dt), do, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
            dbias_ref[i] += jnp.sum(ds, axis=0)
            dsd = ds.astype(dt)
            dq = jax.lax.dot_general(
                dsd, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) * scale
            dk = jax.lax.dot_general(
                dsd, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ) * scale
            dq_parts.append(dq)
            dk_parts.append(dk)
            dv_parts.append(dv)
        dqkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        dqkv2d = dqkv.reshape(blk * n, 3 * c)

        dbqkv_ref[...] += jnp.sum(dqkv2d, axis=0)
        dwqkv_ref[...] += jax.lax.dot_general(
            x2d, dqkv2d.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dxn = jax.lax.dot_general(
            dqkv2d.astype(dt), wqkv_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(blk, n, c)

        # LN1 backward
        dln1s_ref[...] += jnp.sum((dxn * xhat1).reshape(blk * n, c), axis=0)
        dln1b_ref[...] += jnp.sum(dxn.reshape(blk * n, c), axis=0)
        dxh1 = dxn * ln1s_ref[:].astype(jnp.float32)
        dx_ln = rstd1 * (
            dxh1
            - jnp.mean(dxh1, axis=-1, keepdims=True)
            - xhat1 * jnp.mean(dxh1 * xhat1, axis=-1, keepdims=True)
        )
        dx = dx_ln + dh.reshape(blk, n, c)           # residual 1
        dx_ref[:] = dx.astype(dx_ref.dtype)

    return kernel


def fused_swin_block_bwd(
    x_windows, dout,
    ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 16,
):
    """Backward pallas_call: returns grads for every input of the block."""
    bw, n, c = x_windows.shape
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    hidden = w1.shape[1]
    kernel = _make_bwd_kernel(num_heads, head_dim, scale)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    f32 = jnp.float32
    outs = pl.pallas_call(
        kernel,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),  # dx
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32), jax.ShapeDtypeStruct((3 * c,), f32),
            jax.ShapeDtypeStruct((num_heads, n, n), f32),
            jax.ShapeDtypeStruct((c, c), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, hidden), f32), jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, c), f32), jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)),
            tile((c, c)), tile((c,)), tile((c,)), tile((c,)),
            tile((c, hidden)), tile((hidden,)), tile((hidden, c)), tile((c,)),
        ],
        out_specs=(
            pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)),
            tile((c, c)), tile((c,)), tile((c,)), tile((c,)),
            tile((c, hidden)), tile((hidden,)), tile((hidden, c)), tile((c,)),
        ),
    )(
        x_windows, dout,
        ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
    return outs


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18)
)
def fused_swin_block_ad(
    x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2, _unused,
    num_heads, scale, block_windows, packed=False,
):
    """Differentiable fused block: pallas forward + pallas backward."""
    return fused_swin_block(
        x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale, block_windows=block_windows,
        packed=packed,
    )


def fused_swin_block_fwd_h(
    x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    *, num_heads, scale, block_windows, packed=False,
):
    """Forward emitting (out, h) — h feeds the split backward."""
    bw, n, c = x_windows.shape
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    hidden = w1.shape[1]
    kernel = _make_kernel_fwd_h(num_heads, head_dim, scale, packed)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    blk_spec = pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
            jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
        ),
        in_specs=[
            blk_spec,
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)), tile((c, c)), tile((c,)),
            tile((c,)), tile((c,)), tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ],
        out_specs=(blk_spec, blk_spec),
    )(
        x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    )


def _bwd_mlp(h, dout, ln2_scale, ln2_bias, w1, b1, w2, b2, *, block_windows=32):
    bw, n, c = h.shape
    hidden = w1.shape[1]
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    blk_spec = pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        _bwd_mlp_kernel,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), h.dtype),
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, hidden), f32), jax.ShapeDtypeStruct((hidden,), f32),
            jax.ShapeDtypeStruct((hidden, c), f32), jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            blk_spec, blk_spec,
            tile((c,)), tile((c,)), tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ],
        out_specs=(
            blk_spec,
            tile((c,)), tile((c,)), tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ),
    )(h, dout, ln2_scale, ln2_bias, w1, b1, w2, b2)


def _bwd_attn(
    x, dh, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj,
    *, num_heads, scale, block_windows=16, packed=False,
):
    bw, n, c = x.shape
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    kernel = _make_bwd_attn_kernel(num_heads, head_dim, scale, packed)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    blk_spec = pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(bw // blk,),
        out_shape=(
            jax.ShapeDtypeStruct((bw, n, c), x.dtype),
            jax.ShapeDtypeStruct((c,), f32), jax.ShapeDtypeStruct((c,), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32), jax.ShapeDtypeStruct((3 * c,), f32),
            jax.ShapeDtypeStruct((num_heads, n, n), f32),
            jax.ShapeDtypeStruct((c, c), f32), jax.ShapeDtypeStruct((c,), f32),
        ),
        in_specs=[
            blk_spec, blk_spec,
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)), tile((c, c)),
        ],
        out_specs=(
            blk_spec,
            tile((c,)), tile((c,)), tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)), tile((c, c)), tile((c,)),
        ),
    )(x, dh, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj)


def _ad_fwd(
    x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2, _unused,
    num_heads, scale, block_windows, packed=False,
):
    out, h = fused_swin_block_fwd_h(
        x_windows, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
        num_heads=num_heads, scale=scale,
        # the extra h output block pushes 32-window tiles 132KB over VMEM
        block_windows=min(block_windows, 16), packed=packed,
    )
    res = (
        x_windows, h, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
    return out, res


def _ad_bwd(num_heads, scale, block_windows, packed, res, dout):
    (
        x_windows, h, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    ) = res
    # fp32 (blk*n, hidden) intermediates dominate the mlp-bwd live set:
    # 32-window tiles fit at hidden<=384 but overflow scoped vmem by 5.6MB
    # at the flagship hidden=720 (effective mlp_ratio 4); the tanh-GELU
    # derivative keeps one more live (blk*n, hidden) f32 than the erf one
    # and overflows 16-window tiles by 0.79M, so it drops to 8 (measured:
    # fast=True blk=16 FAIL / blk=8 OK, fast=False blk=16 OK).
    if w1.shape[1] <= 384:
        mlp_cap = 32
    elif w1.dtype == jnp.bfloat16 and FAST_GELU_BF16:
        mlp_cap = 8
    else:
        mlp_cap = 16
    dh, dln2s, dln2b, dw1, db1, dw2, db2 = _bwd_mlp(
        h, dout, ln2_scale, ln2_bias, w1, b1, w2, b2,
        block_windows=min(block_windows, mlp_cap),
    )
    dx, dln1s, dln1b, dwqkv, dbqkv, dbias, dwproj, dbproj = _bwd_attn(
        x_windows, dh, ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj,
        num_heads=num_heads, scale=scale,
        # attention-bwd live set overflows VMEM by 1.4MB at 16 windows
        block_windows=min(block_windows, 8), packed=packed,
    )
    cast = lambda g, ref: g.astype(ref.dtype)  # noqa: E731
    return (
        dx,
        cast(dln1s, ln1_scale), cast(dln1b, ln1_bias),
        cast(dwqkv, wqkv), cast(dbqkv, bqkv), cast(dbias, bias),
        cast(dwproj, wproj), cast(dbproj, bproj),
        cast(dln2s, ln2_scale), cast(dln2b, ln2_bias),
        cast(dw1, w1), cast(db1, b1), cast(dw2, w2), cast(db2, b2),
        None,
    )


fused_swin_block_ad.defvjp(_ad_fwd, _ad_bwd)


def make_fused_swinir(
    *,
    depths,
    num_heads,
    window_size: int = 8,
    upscale: int = 4,
    block_windows: int | None = None,
    dtype=jnp.bfloat16,
    differentiable: bool = False,
):
    """Functional SwinIR forward over the standard params tree with every
    transformer block running through :func:`fused_swin_block`.

    Single-device inference path (`bench.py --impl fused`); convs/pixel-
    shuffle head and tail stay XLA. Requires H, W multiples of window_size.
    """
    import numpy as np

    from ..ops import window_partition, window_reverse, relative_position_index_sa
    from ..ops.pixelshuffle import pixel_shuffle

    ws = window_size
    if block_windows is None:
        # VMEM budget: fp32 activations are 2x bf16 — 32 windows fits bf16,
        # 16 fits fp32 (measured: 32@fp32 overflows scoped vmem by ~0.7MB)
        block_windows = 32 if dtype == jnp.bfloat16 else 16

    def conv3(p, x):
        return (
            jax.lax.conv_general_dilated(
                x, p["conv"]["kernel"].astype(x.dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + p["conv"]["bias"].astype(x.dtype)
        )

    def block(p, x, heads, shift):
        b, h, w, c = x.shape
        d = c // heads
        rpb = p["attn"]["relative_position_bias_table"]
        rpi = relative_position_index_sa(ws)
        bias = (
            rpb[rpi.reshape(-1)]
            .reshape(ws * ws, ws * ws, heads)
            .transpose(2, 0, 1)
            .astype(jnp.float32)
        )
        y = jnp.roll(x, (-shift, -shift), axis=(1, 2)) if shift else x
        xw = window_partition(y, ws).reshape(-1, ws * ws, c)
        block_args = (
            xw,
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
        )
        from .packed_heads import packing_helps

        packed = packing_helps(heads, d, ws * ws, ws * ws, train=differentiable)
        if differentiable:
            out = fused_swin_block_ad(
                *block_args, None, heads, d**-0.5, block_windows, packed
            )
        else:
            out = fused_swin_block(
                *block_args,
                num_heads=heads, scale=d**-0.5, block_windows=block_windows,
                packed=packed,
            )
        y = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        return jnp.roll(y, (shift, shift), axis=(1, 2)) if shift else y

    @jax.jit
    def fn(params, x):
        b, h, w, _ = x.shape
        assert h % ws == 0 and w % ws == 0
        x = x.astype(dtype)
        x_first = conv3(params["conv_first"], x)
        res = x_first
        for i, depth in enumerate(depths):
            for j in range(depth):
                res = block(
                    params[f"layers_{i}_{j}"], res, num_heads[i],
                    0 if j % 2 == 0 else ws // 2,
                )
        # final LN over channels
        ln = params["norm"]["ln"]
        res = _ln_f32(res, ln["scale"], ln["bias"]).astype(dtype)
        res = conv3(params["conv_after_body"], res) + x_first

        out = conv3(params["conv_before_upsample"], res)
        out = jnp.where(out >= 0, out, out * 0.01)
        n_up = int(np.log2(upscale)) if upscale != 3 else 1
        if upscale == 3:
            out = conv3(params["upsample_0"], out)
            out = pixel_shuffle(out, 3)
        else:
            for s in range(n_up):
                out = conv3(params[f"upsample_{s}"], out)
                out = pixel_shuffle(out, 2)
        return conv3(params["conv_last"], out)

    return fn


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "block_windows", "packed")
)
def fused_swin_block(
    x_windows,            # (Bw, N, C) pre-partitioned (+pre-rolled) windows
    ln1_scale, ln1_bias,
    wqkv, bqkv,           # (C, 3C), (3C,)
    bias,                 # (heads, N, N) relative-position bias, fp32
    wproj, bproj,
    ln2_scale, ln2_bias,
    w1, b1, w2, b2,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 32,
    packed: bool | None = None,
):
    bw, n, c = x_windows.shape
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    hidden = w1.shape[1]

    if packed is None:
        from .packed_heads import packing_helps

        packed = packing_helps(num_heads, head_dim, n, n)
    kernel = _make_kernel(num_heads, head_dim, scale, packed)
    grid = (bw // blk,)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bw, n, c), x_windows.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            tile((c,)), tile((c,)),
            tile((c, 3 * c)), tile((3 * c,)),
            tile((num_heads, n, n)),
            tile((c, c)), tile((c,)),
            tile((c,)), tile((c,)),
            tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ],
        out_specs=pl.BlockSpec(
            (blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(
        x_windows,
        ln1_scale, ln1_bias, wqkv, bqkv, bias, wproj, bproj,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
