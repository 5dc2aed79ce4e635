"""Window attention compute core — XLA reference path + Pallas TPU kernel.

The single hottest op in both generators: per-window multi-head attention
with a relative-position bias (plus an optional shifted-window mask in HAT).
36 Swin blocks x 256 windows x (64x64) per 128x128 patch
(reference architecture_swin.py:71-96, hat_arch.py:165-196).

API: operates on pre-projected q, k, v of shape (B, heads, N, d) where
B = batch * num_windows, with bias (heads, Nq, Nk) and optional additive
mask (nW, Nq, Nk) tiled over the batch like the reference.

Two implementations selected by flag:
  - "xla":    einsum formulation; XLA fuses softmax chains well and this is
              the correctness reference.
  - "pallas": fused QK^T + bias + softmax + PV kernel, one grid step per
              block of windows, fp32 accumulation in bf16 compute.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_IMPL = "xla"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas")
    _DEFAULT_IMPL = impl


def _attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    bw, h, n, d = q.shape
    q = q * scale
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, h, n, -1) + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bw, h, n, -1)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def _fused_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
    """One grid step: (BLK, N, d) q against (BLK, M, d) k/v for one head.

    grid = (num_window_blocks, heads). Matmuls run on the MXU in the input
    dtype (bf16 in the fast path) with fp32 accumulation; the softmax chain
    stays fp32 on the VPU.
    """
    q = q_ref[0]  # (BLK, N, d), input dtype
    k = k_ref[0]  # (BLK, M, d)
    v = v_ref[0]
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (BLK, N, M) fp32
    attn = attn + bias_ref[0].astype(jnp.float32)
    attn = attn + mask_ref[:].astype(jnp.float32)
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """Mask-free variant — avoids streaming a zeros mask from HBM
    (SwinIR's shifted windows are deliberately unmasked, so this is the
    hot path)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    attn = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    attn = attn + bias_ref[0].astype(jnp.float32)
    attn = attn - jnp.max(attn, axis=-1, keepdims=True)
    attn = jnp.exp(attn)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _fused_kernel_allheads(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """Grid over window blocks only; static loop over heads in-kernel.

    Avoids the (Bw, h) <-> (h, Bw) relayout transposes of the per-head grid
    (they cost more than the attention math at these shapes).
    q/k/v blocks: (BLK, h, N|M, d); bias: (h, N, M)."""
    heads = q_ref.shape[1]
    for i in range(heads):
        q = q_ref[:, i]
        k = k_ref[:, i]
        v = v_ref[:, i]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        attn = attn + bias_ref[i].astype(jnp.float32)
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, i] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows"))
def _attention_pallas_allheads(q, k, v, bias, scale, block_windows=16):
    """No-mask fast path in native (Bw, h, N, d) layout, no transposes."""
    bw, h, n, d = q.shape
    m = k.shape[2]
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    q = q * scale
    grid = (bw // blk,)
    return pl.pallas_call(
        _fused_kernel_allheads,
        out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, h, m, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, h, m, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n, m), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blk, h, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("scale", "block_windows"))
def _attention_pallas(q, k, v, bias, mask_tiled, scale, block_windows=8):
    """q,k,v: (Bw, h, N|M, d); bias: (h, N, M); mask_tiled: (Bw, N, M)|None."""
    bw, h, n, d = q.shape
    m = k.shape[2]
    blk = min(block_windows, bw)
    while bw % blk:
        blk -= 1
    q = (q * scale).swapaxes(0, 1)  # (h, Bw, N, d)
    k = k.swapaxes(0, 1)
    v = v.swapaxes(0, 1)

    grid = (bw // blk, h)
    qkv_specs = [
        pl.BlockSpec((1, blk, n, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, m, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, m, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, m), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, blk, n, d), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    if mask_tiled is None:
        out = pl.pallas_call(
            _fused_kernel_nomask,
            out_shape=jax.ShapeDtypeStruct((h, bw, n, d), q.dtype),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=out_spec,
        )(q, k, v, bias)
    else:
        out = pl.pallas_call(
            _fused_kernel,
            out_shape=jax.ShapeDtypeStruct((h, bw, n, d), q.dtype),
            grid=grid,
            in_specs=qkv_specs
            + [pl.BlockSpec((blk, n, m), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=out_spec,
        )(q, k, v, bias, mask_tiled)
    return out.swapaxes(0, 1)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Multi-head window attention.

    Args:
      q: (Bw, heads, Nq, d) — Bw = batch * num_windows.
      k, v: (Bw, heads, Nk, d).
      bias: (heads, Nq, Nk) relative-position bias.
      mask: optional (nW, Nq, Nk) additive mask, tiled over batch.
      scale: query scale (head_dim ** -0.5 unless overridden).
    Returns:
      (Bw, heads, Nq, d).
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "xla":
        return _attention_xla(q, k, v, bias, mask, scale)
    bw, _, n, _ = q.shape
    if mask is None:
        return _attention_pallas_allheads(q, k, v, bias, float(scale))
    nw = mask.shape[0]
    mask_tiled = jnp.tile(mask, (bw // nw, 1, 1))
    return _attention_pallas(q, k, v, bias, mask_tiled, float(scale))
