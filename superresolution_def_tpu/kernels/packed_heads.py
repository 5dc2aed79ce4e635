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

Defaults (on-chip A/Bs, PERF.md rounds 3-4): packing is ON (`auto`) on
the TPU backend for BOTH forward kernels (+9.2% config #1, +9.7%
config #2, round-3 final session) and training kernels (+7.3% config
#3, +3.2% on the opt-in fused-HAB hybrid path, round-4 playbook), and
OFF on non-TPU backends (no MXU to win on; keeps the CPU test tier's
fp32 parity expectations bit-stable). `SRDEF_PACKED` overrides both
ways: `off` forces the per-head loop everywhere, `auto`/`<g>` forces
packing everywhere (how the bench*_packed A/Bs were run).
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


def best_group(num_heads: int, head_dim: int, nq: int, nk: int) -> int:
    """Head-group size minimizing MXU tile-passes for one window's QK+PV.

    A dot (M,K)x(K,N) costs ceil(M/128)*ceil(K/128)*ceil(N/128) 128-deep
    systolic passes. Packing g heads stacks queries to M=g*nq and keeps
    the contraction at K=g*hd, so per stage the whole window costs
    (H/g)*ceil(g*nq/128)*ceil(g*hd/128)*ceil(nk/128) passes (QK and PV
    are symmetric in K/N). Examples at nq=64, nk=64:
      hd=15, H=6 (HAT embed 90):  g=1 -> 6, g=2 -> 3, g=6 -> 3  => g=6
      hd=30, H=6 (swin embed 180): g=1 -> 6, g=2 -> 3, g=6 -> 6 => g=2
    Ties break toward the LARGER group (fewer dot dispatches, better MXU
    pipelining). Pure shape model — env gating lives in `_env_mode` /
    `packed_group`.
    """

    def passes(g):
        t = lambda m: -(-m // 128)  # noqa: E731
        return (num_heads // g) * t(g * nq) * t(g * head_dim) * t(nk)

    return max(
        (g for g in range(1, num_heads + 1) if num_heads % g == 0),
        key=lambda g: (-passes(g), g),
    )


def _env_mode(train: bool = False) -> str | None:
    """Packing mode for a call site. SRDEF_PACKED, when set, decides for
    BOTH forward and training kernels: '0'/'off'/'false' = per-head loop,
    a digit g>=2 = forced group size, anything else = 'auto'
    (tile-pass-model grouping).

    When the env var is UNSET the default splits by call-site kind:

    - forward/inference kernels on the TPU backend: 'auto'. A/B'd on a
      real v5e (PERF.md round-3 final session): packed compiles and wins
      +9.2% on config #1 (84.2 -> 91.96 p/s) and +9.7% on config #2
      (48.31 -> 52.98 p/s).
    - training kernels (custom-VJP forward+backward) on TPU: 'auto'
      since the round-4 on-chip A/Bs landed (PERF.md round-4 section):
      config #3 packed 13.813 vs 12.874 p/s loop (+7.3%), and on the
      opt-in fused-HAB training path packed 4.124 vs 3.997 (+3.2%) —
      the packed backward compiles and wins at both call sites.
    - any non-TPU backend: None. Packing only pays on the MXU, and the
      per-head loop keeps the long-pinned fp32 parity expectations of
      the CPU test tier bit-stable.

    Gating caveats (both defaults): the backend is resolved via
    `jax.default_backend()` at TRACE time — fix SRDEF_PACKED and the
    backend before the first trace of a kernel; a later env change will
    not retrace an already-jitted call (the group size is a jit-static
    value), and `jax.default_device(cpu)` on a TPU host still reports
    'tpu' here (use SRDEF_PACKED=off to force the loop in that setup).
    An explicitly exported EMPTY value (`SRDEF_PACKED=`) means 'off',
    as it did before the packed defaults landed; only an UNSET variable
    selects the measured defaults.
    """
    v = os.environ.get("SRDEF_PACKED")
    if v is None:
        default = PACKED_DEFAULT_TRAIN if train else PACKED_DEFAULT_FWD
        if default is None:
            return None
        import jax

        return default if jax.default_backend() == "tpu" else None
    v = v.lower()
    if v in ("", "0", "off", "false"):
        return None
    if v.isdigit() and int(v) >= 2:
        return v
    return "auto"


# Measured defaults — see _env_mode's docstring for the evidence.
PACKED_DEFAULT_FWD: str | None = "auto"
PACKED_DEFAULT_TRAIN: str | None = "auto"


def env_group(num_heads: int, train: bool = False) -> int | None:
    """Forced group size from SRDEF_PACKED=<g>, if set, valid and dividing
    num_heads; else None (use the shape model)."""
    mode = _env_mode(train)
    if mode not in (None, "auto"):
        g = int(mode)
        if num_heads % g == 0:
            return g
    return None


def packed_group(
    num_heads: int, head_dim: int, nq: int, nk: int, train: bool = False
) -> int:
    """Mode-aware group size: 1 (= per-head loop) when `_env_mode` says
    packing is off for this call-site kind, else the forced group or the
    tile-pass-model best."""
    mode = _env_mode(train)
    if mode is None:
        return 1
    forced = env_group(num_heads, train)
    if forced is not None:
        return forced
    return best_group(num_heads, head_dim, nq, nk)


def packing_helps(
    num_heads: int, head_dim: int, nq: int, nk: int, train: bool = False
) -> bool:
    """True when packing is enabled for this call-site kind AND some head
    grouping strictly beats the per-head loop on MXU tile-passes."""
    return packed_group(num_heads, head_dim, nq, nk, train) > 1


def packed_mha(q_all, k_all, v_all, bias, mask, *, num_heads: int, scale: float,
               group: int | None = None):
    """Grouped-head window attention in batched block-diagonal dots.

    q_all/k_all/v_all: (blk, nq|nk, c) in the kernel io dtype (q unscaled).
    bias: (H, nq, nk) f32 or None. mask: (blk, nq, nk) f32 or None.
    group: heads per packed dot (None = best_group; num_heads = one dot).
    Returns attn_out (blk, nq, c) f32 — term-for-term identical to the
    per-head loop.
    """
    blk, nq, c = q_all.shape
    nk = k_all.shape[1]
    hd = c // num_heads
    if group is None:
        group = env_group(num_heads) or best_group(num_heads, hd, nq, nk)
    g = group
    if g == num_heads:
        return _packed_mha_slab(q_all, k_all, v_all, bias, mask,
                                num_heads=num_heads, scale=scale)
    cg = g * hd
    outs = []
    for j in range(num_heads // g):
        sl = slice(j * cg, (j + 1) * cg)
        outs.append(_packed_mha_slab(
            q_all[:, :, sl], k_all[:, :, sl], v_all[:, :, sl],
            None if bias is None else bias[j * g : (j + 1) * g], mask,
            num_heads=g, scale=scale,
        ))
    return jnp.concatenate(outs, axis=-1)


def _packed_mha_slab(q_all, k_all, v_all, bias, mask, *, num_heads: int,
                     scale: float):
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
                     scale: float, group: int | None = None):
    """Recompute the grouped-packed softmax and return attention gradients.

    dattn: (blk, nq, c) f32 cotangent of the concatenated attention output.
    group: heads per packed dot (None = best_group; num_heads = one dot).
    Returns (attn_out, dq, dk, dv, dbias):
      attn_out (blk, nq, c) f32 — the recomputed forward (for dWproj),
      dq (blk, nq, c) f32, dk/dv (blk, nk, c) f32 (concatenated heads),
      dbias (H, nq, nk) f32 summed over the tile's windows.
    Term-for-term identical to the per-head backward loop.
    """
    blk, nq, c = q_all.shape
    nk = k_all.shape[1]
    hd = c // num_heads
    if group is None:
        group = env_group(num_heads) or best_group(num_heads, hd, nq, nk)
    g = group
    if g == num_heads:
        return _packed_mha_grads_slab(q_all, k_all, v_all, dattn, bias, mask,
                                      num_heads=num_heads, scale=scale)
    cg = g * hd
    parts = []
    for j in range(num_heads // g):
        sl = slice(j * cg, (j + 1) * cg)
        parts.append(_packed_mha_grads_slab(
            q_all[:, :, sl], k_all[:, :, sl], v_all[:, :, sl],
            dattn[:, :, sl],
            None if bias is None else bias[j * g : (j + 1) * g], mask,
            num_heads=g, scale=scale,
        ))
    attn_out, dq, dk, dv, dbias = (
        jnp.concatenate([p[i] for p in parts], axis=-1 if i < 4 else 0)
        for i in range(5)
    )
    return attn_out, dq, dk, dv, dbias


def _packed_mha_grads_slab(q_all, k_all, v_all, dattn, bias, mask, *,
                           num_heads: int, scale: float):
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


def use_packed(c: int, train: bool = False) -> bool:
    """Gate for the HAT kernels: pack when `_env_mode` enables packing
    for this call-site kind AND the channel width fits one lane tile,
    where the packing halves MXU passes (e.g. HAT embed 90). Wider
    embeds go through `packing_helps` with real nq/nk instead.

    Defaults (env unset): ON for forward AND training kernels on TPU —
    A/B'd on-chip, compiles and wins at every measured call site
    (PERF.md rounds 3-4) — OFF on non-TPU backends; see `_env_mode`."""
    return _env_mode(train) is not None and c <= 128
