"""Fused OCAB (overlapping cross-attention block) Pallas kernel.

The reference OCAB (hat_arch/hat_arch.py:352-438) runs once per RHAG: LN1
-> qkv dense -> q in ws x ws windows / kv in overlapping owin x owin
windows (nn.Unfold stride ws) -> cross-attention with relative-position
bias -> proj + shortcut -> LN2 -> MLP.

XLA computes the parts it is already good at — LN1, the one wide qkv
matmul, the static window/overlap gathers — and this kernel runs the whole
per-window tail in one VMEM tile per block of windows: cross-attention
(nq=ws^2 query tokens vs nk=owin^2 key/value tokens per window), proj,
shortcut add, LN2 and the MLP, with fp32 accumulation on every matmul.
That removes the ~6 HBM round-trips between those ops (the attention
matrices alone are nk/nq times larger than the activations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .swin_block import _gelu, _ln_f32


def _make_ocab_kernel(num_heads: int, head_dim: int, scale: float,
                      packed: bool = False):
    c = num_heads * head_dim

    def kernel(
        x_ref,        # (BLK, NQ, C)  shortcut windows
        q_ref,        # (BLK, NQ, C)  q = LN1(x) @ Wq (+bq), windowed
        k_ref,        # (BLK, NK, C)  overlap-windowed keys
        v_ref,        # (BLK, NK, C)  overlap-windowed values
        bias_ref,     # (heads, NQ, NK) fp32 relative-position bias
        wproj_ref, bproj_ref,         # (C, C), (C,)
        ln2s_ref, ln2b_ref,           # (C,)
        w1_ref, b1_ref,               # (C, H), (H,)
        w2_ref, b2_ref,               # (H, C), (C,)
        o_ref,                        # (BLK, NQ, C)
    ):
        x = x_ref[:]
        blk, nq, _ = x.shape
        dt = x.dtype
        q_all = q_ref[:]
        k_all = k_ref[:]
        v_all = v_ref[:]

        if packed:
            from .packed_heads import packed_mha

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
                )  # (blk, nq, nk)
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
        h = x.astype(jnp.float32).reshape(blk * nq, c) + proj  # + shortcut

        hn = _ln_f32(h.astype(dt).reshape(blk, nq, c), ln2s_ref[:], ln2b_ref[:]).astype(dt)
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
def fused_ocab_block(
    x_windows,   # (BW, NQ, C)
    q_windows,   # (BW, NQ, C)
    k_windows,   # (BW, NK, C)
    v_windows,   # (BW, NK, C)
    bias,        # (heads, NQ, NK) fp32
    wproj, bproj, ln2_scale, ln2_bias, w1, b1, w2, b2,
    *,
    num_heads: int,
    scale: float,
    block_windows: int = 16,
    packed: bool | None = None,
):
    bw, nq, c = x_windows.shape
    nk = k_windows.shape[1]
    hidden = w1.shape[1]
    head_dim = c // num_heads
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    if packed is None:
        from .packed_heads import use_packed

        packed = use_packed(c)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    def wspec(n):
        return pl.BlockSpec((blk, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_ocab_kernel(num_heads, head_dim, scale, packed),
        grid=(bw // blk,),
        out_shape=jax.ShapeDtypeStruct((bw, nq, c), x_windows.dtype),
        in_specs=[
            wspec(nq), wspec(nq), wspec(nk), wspec(nk),
            tile((num_heads, nq, nk)),
            tile((c, c)), tile((c,)),
            tile((c,)), tile((c,)),
            tile((c, hidden)), tile((hidden,)),
            tile((hidden, c)), tile((c,)),
        ],
        out_specs=wspec(nq),
    )(
        x_windows, q_windows, k_windows, v_windows, bias,
        wproj, bproj, ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
