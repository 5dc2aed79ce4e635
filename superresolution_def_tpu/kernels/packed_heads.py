"""Head-packed multi-head window attention for small head_dim.

The HAT configs (hat_arch.py:352-438; train_hat.py:132-136) run embed 90
with 6 heads -> head_dim 15. The straightforward per-head loop issues
MXU dots of shape (nq,15)x(15,nk) / (nq,nk)x(nk,15): the contraction (or
output) dimension is 15 against the MXU's 128 lanes, so every head costs
a full 128-deep systolic pass at ~12% fill, and 6 heads cost 6 passes.

This module packs ALL heads into single dots via block-diagonal zero
masking on the channel axis, stacking heads along the token (M) axis:

    Q_bd  (blk, H*nq, c)   row-block h holds q_h in columns [h*hd,(h+1)*hd),
                           exact zeros elsewhere
    A     = Q_bd @ K^T     one dot, batch=blk: row-block h = q_h @ k_h^T
                           (off-head terms multiply exact zeros)
    O     = softmax(A) @ V row-block h, col-block g = p_h @ v_g; the
                           diagonal blocks are extracted by a mask-reduce

For c <= 128 (one lane tile) this halves the MXU pass count per matmul:
QK goes from H passes (one underfilled pass per head) to ceil(H*nq/128)
passes at full contraction depth, e.g. H=6, nq=64, c=90: 6 -> 3. The
stack/unstack masking is VPU elementwise work (H*nq*c mul-adds), ~1% of
the dot cost. For c > 128 the pass counts tie and the packing only adds
VPU work, so callers gate on c.

Numerics: mathematically identical to the per-head loop — the extra
contraction terms are exact zeros, the softmax rows see the same values,
and every cast point (q*scale in the io dtype, probabilities cast to the
io dtype before PV, f32 bias add) matches the loop form. The only
deviation is f32 summation ORDER inside a dot: a backend may block a
K=90 contraction differently from a K=15 one and reassociate the same
nonzero terms (measured ~1 ulp, 6e-6 max abs on XLA:CPU interpret mode).
tests/test_packed_heads.py pins packed-vs-loop agreement to a few ulps
in fp32 and bf16.

These helpers are plain traced jnp code meant to be CALLED INSIDE a
Pallas kernel body (hab_train.py, swin_block.py, ocab.py, ocab_train.py)
— they are not pallas_calls themselves.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def head_mask(num_heads: int, head_dim: int, dtype):
    """(H, 1, c) mask with ones in head h's channel block, zeros elsewhere."""
    c = num_heads * head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, c), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, c), 0)
    return (col // head_dim == row).astype(dtype)


def stack_heads(x, hm):
    """(blk, n, c) -> block-diagonal (blk, H*n, c): row-block h keeps only
    head h's channel columns."""
    blk, n, c = x.shape
    nh = hm.shape[0]
    return (x[:, None, :, :] * hm[None, :, :, :]).reshape(blk, nh * n, c)


def unstack_heads(y, hm):
    """(blk, H*n, c) -> (blk, n, c): extract the diagonal blocks (row-block
    h's head-h channel columns) and sum — each output element has exactly
    one non-zero contribution."""
    blk, hn, c = y.shape
    nh = hm.shape[0]
    n = hn // nh
    return jnp.sum(y.reshape(blk, nh, n, c) * hm[None], axis=1)


def packed_mha(q_all, k_all, v_all, bias, mask, *, num_heads: int, scale: float):
    """All-heads window attention in two batched dots.

    q_all/k_all/v_all: (blk, nq|nk, c) in the kernel io dtype (q unscaled).
    bias: (H, nq, nk) f32 or None. mask: (blk, nq, nk) f32 or None.
    Returns attn_out (blk, nq, c) f32 — bit-identical to the per-head loop.
    """
    blk, nq, c = q_all.shape
    nk = k_all.shape[1]
    dt = q_all.dtype
    hd = c // num_heads
    hm = head_mask(num_heads, hd, dt)
    qbd = stack_heads(q_all * jnp.asarray(scale, dt), hm)
    a = jax.lax.dot_general(
        qbd, k_all, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (blk, H*nq, nk)
    a = _add_bias_mask(a, bias, mask, num_heads, nq, nk)
    a = a - jnp.max(a, axis=-1, keepdims=True)
    a = jnp.exp(a)
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        a.astype(dt), v_all, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (blk, H*nq, c)
    return unstack_heads(o, hm.astype(jnp.float32))


def _add_bias_mask(a, bias, mask, num_heads, nq, nk):
    blk = a.shape[0]
    a4 = a.reshape(blk, num_heads, nq, nk)
    if bias is not None:
        a4 = a4 + bias[None].astype(jnp.float32)
    if mask is not None:
        a4 = a4 + mask[:, None].astype(jnp.float32)
    return a4.reshape(blk, num_heads * nq, nk)


def packed_mha_grads(q_all, k_all, v_all, dattn, bias, mask, *, num_heads: int,
                     scale: float):
    """Recompute the packed softmax and return attention gradients.

    dattn: (blk, nq, c) f32 cotangent of the concatenated attention output.
    Returns (attn_out, dq, dk, dv, dbias):
      attn_out (blk, nq, c) f32 — the recomputed forward (for dWproj),
      dq (blk, nq, c) f32, dk/dv (blk, nk, c) f32 (concatenated heads),
      dbias (H, nq, nk) f32 summed over the tile's windows.
    Bit-identical to the per-head backward loop at every cast point.
    """
    blk, nq, c = q_all.shape
    nk = k_all.shape[1]
    dt = q_all.dtype
    hd = c // num_heads
    hm = head_mask(num_heads, hd, dt)
    hmf = hm.astype(jnp.float32)

    qbd_scaled = stack_heads(q_all * jnp.asarray(scale, dt), hm)
    a = jax.lax.dot_general(
        qbd_scaled, k_all, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    a = _add_bias_mask(a, bias, mask, num_heads, nq, nk)
    a = a - jnp.max(a, axis=-1, keepdims=True)
    a = jnp.exp(a)
    a = a / jnp.sum(a, axis=-1, keepdims=True)  # (blk, H*nq, nk) f32
    ad = a.astype(dt)

    attn_out = unstack_heads(
        jax.lax.dot_general(
            ad, v_all, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ),
        hmf,
    )

    do_bd = stack_heads(dattn.astype(dt), hm)  # (blk, H*nq, c)
    da = jax.lax.dot_general(
        do_bd, v_all, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (blk, H*nq, nk): row-block h = do_h @ v_h^T
    # dv: contract the stacked axis — off-head terms hit do_bd's zeros.
    dv = jax.lax.dot_general(
        ad, do_bd, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (blk, nk, c), heads concatenated
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dbias = jnp.sum(ds.reshape(blk, num_heads, nq, nk), axis=0)
    dsd = ds.astype(dt)
    dq = unstack_heads(
        jax.lax.dot_general(
            dsd, k_all, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ),
        hmf,
    ) * scale  # (blk, nq, c)
    # dk: contract the stacked axis against the block-diagonal UNSCALED q.
    qbd = stack_heads(q_all, hm)
    dk = jax.lax.dot_general(
        dsd, qbd, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (blk, nk, c)
    return attn_out, dq, dk, dv, dbias


def use_packed(c: int) -> bool:
    """Default gate: pack only when the channel width fits one lane tile,
    where the packing halves MXU passes (e.g. HAT embed 90). Wider embeds
    (swin 180) tie on passes and only add VPU masking work.

    SRDEF_PACKED=0 in the environment disables packing everywhere — the
    kill switch in case a Mosaic version rejects the packed layout (the
    per-head loop is the long-validated fallback)."""
    if os.environ.get("SRDEF_PACKED", "").lower() in ("0", "off", "false"):
        return False
    return c <= 128
