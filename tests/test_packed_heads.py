"""Equivalence of head-packed attention vs the per-head loop.

kernels/packed_heads.py replaces the per-head MXU dots (head_dim 15 at
HAT's embed 90, hat_arch.py:129-296) with block-diagonal head-packed
dots. The packing is term-for-term identical — the extra contraction
terms multiply exact zeros and every cast point matches the loop form —
so these tests assert near-ulp agreement between packed=True and False
for the HAB and OCAB training kernels, fp32 and bf16, in interpret mode
— up to dot-contraction reassociation: XLA:CPU blocks a K=90 dot
differently from a K=15 one, reordering the same nonzero f32 terms
(~1 ulp; measured 6e-6 max abs). Tolerances pin that, and nothing more.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.kernels.hab_train import _hab_fwd_h, _hab_bwd_attn
from superresolution_def_tpu.kernels.ocab_train import _ocab_fwd_h, _ocab_bwd_attn

HEADS, HD = 6, 15
C = HEADS * HD  # 90 — the HAT "Soft" embed (train_hat.py:132)
N = 64          # ws=8 windows
NK = 144        # (ws + ws*overlap_ratio)^2 = 12^2 overlap windows
BW = 4
HIDDEN = 2 * C
SCALE = HD**-0.5


def _assert_close(actual, desired, dtype):
    a, d = np.asarray(actual, np.float32), np.asarray(desired, np.float32)
    if dtype == jnp.bfloat16:
        np.testing.assert_allclose(a, d, rtol=2e-2, atol=0.15)
    else:
        np.testing.assert_allclose(a, d, rtol=2e-3, atol=5e-4)


def _rng(shape, seed, dtype):
    x = np.random.default_rng(seed).standard_normal(shape, np.float32) * 0.2
    return jnp.asarray(x).astype(dtype)


def _hab_args(dtype):
    return dict(
        x_w=_rng((BW, N, C), 0, dtype),
        convx_w=_rng((BW, N, C), 1, dtype),
        mask=_rng((BW, N, N), 2, jnp.float32) * 5.0,
        dp1=jnp.ones((BW, 1, C), jnp.float32),
        dp2=jnp.ones((BW, 1, C), jnp.float32),
        ln1s=_rng((C,), 3, jnp.float32) + 1.0,
        ln1b=_rng((C,), 4, jnp.float32),
        wqkv=_rng((C, 3 * C), 5, dtype),
        bqkv=_rng((3 * C,), 6, jnp.float32),
        bias=_rng((HEADS, N, N), 7, jnp.float32),
        wproj=_rng((C, C), 8, dtype),
        bproj=_rng((C,), 9, jnp.float32),
        ln2s=_rng((C,), 10, jnp.float32) + 1.0,
        ln2b=_rng((C,), 11, jnp.float32),
        w1=_rng((C, HIDDEN), 12, dtype),
        b1=_rng((HIDDEN,), 13, jnp.float32),
        w2=_rng((HIDDEN, C), 14, dtype),
        b2=_rng((C,), 15, jnp.float32),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_hab_forward_packed_bitexact(dtype):
    args = _hab_args(dtype)
    fwd = functools.partial(
        _hab_fwd_h, num_heads=HEADS, scale=SCALE, conv_scale=0.01,
        block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        out0, h0 = fwd(*args.values(), packed=False)
        out1, h1 = fwd(*args.values(), packed=True)
    _assert_close(out1, out0, dtype)
    _assert_close(h1, h0, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_hab_backward_packed_bitexact(dtype):
    a = _hab_args(dtype)
    dh = _rng((BW, N, C), 20, dtype)
    bwd = functools.partial(
        _hab_bwd_attn, num_heads=HEADS, scale=SCALE, block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        r0 = bwd(a["x_w"], dh, a["mask"], a["dp1"], a["ln1s"], a["ln1b"],
                 a["wqkv"], a["bqkv"], a["bias"], a["wproj"], packed=False)
        r1 = bwd(a["x_w"], dh, a["mask"], a["dp1"], a["ln1s"], a["ln1b"],
                 a["wqkv"], a["bqkv"], a["bias"], a["wproj"], packed=True)
    for g0, g1 in zip(r0, r1):
        _assert_close(g1, g0, dtype)


def _ocab_args(dtype):
    return dict(
        x_w=_rng((BW, N, C), 0, dtype),
        q_w=_rng((BW, N, C), 1, dtype),
        k_w=_rng((BW, NK, C), 2, dtype),
        v_w=_rng((BW, NK, C), 3, dtype),
        bias=_rng((HEADS, N, NK), 4, jnp.float32),
        wproj=_rng((C, C), 5, dtype),
        bproj=_rng((C,), 6, jnp.float32),
        ln2s=_rng((C,), 7, jnp.float32) + 1.0,
        ln2b=_rng((C,), 8, jnp.float32),
        w1=_rng((C, HIDDEN), 9, dtype),
        b1=_rng((HIDDEN,), 10, jnp.float32),
        w2=_rng((HIDDEN, C), 11, dtype),
        b2=_rng((C,), 12, jnp.float32),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ocab_forward_packed_bitexact(dtype):
    args = _ocab_args(dtype)
    fwd = functools.partial(
        _ocab_fwd_h, num_heads=HEADS, scale=SCALE, block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        out0, h0 = fwd(*args.values(), packed=False)
        out1, h1 = fwd(*args.values(), packed=True)
    _assert_close(out1, out0, dtype)
    _assert_close(h1, h0, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_ocab_backward_packed_bitexact(dtype):
    a = _ocab_args(dtype)
    dh = _rng((BW, N, C), 20, dtype)
    bwd = functools.partial(
        _ocab_bwd_attn, num_heads=HEADS, scale=SCALE, block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        r0 = bwd(a["q_w"], a["k_w"], a["v_w"], dh, a["bias"], a["wproj"],
                 packed=False)
        r1 = bwd(a["q_w"], a["k_w"], a["v_w"], dh, a["bias"], a["wproj"],
                 packed=True)
    for g0, g1 in zip(r0, r1):
        _assert_close(g1, g0, dtype)

# --- swin W-MSA (embed 180, head_dim 30: best grouping = pairs of heads,
# packed_heads.best_group) — forward, fwd_h, and attention backward -------

from superresolution_def_tpu.kernels.swin_block import (  # noqa: E402
    fused_swin_block, fused_swin_block_fwd_h, _bwd_attn,
)
from superresolution_def_tpu.kernels.packed_heads import best_group  # noqa: E402

S_HEADS, S_HD = 6, 30
S_C = S_HEADS * S_HD  # 180 — flagship SwinIR embed (train_swin.py:147)
S_HIDDEN = 2 * S_C
S_SCALE = S_HD**-0.5


def test_best_group_models_shapes():
    assert best_group(S_HEADS, S_HD, N, N) == 2      # swin: pairs
    assert best_group(HEADS, HD, N, N) == HEADS      # HAT HAB: full pack
    assert best_group(HEADS, HD, N, NK) == HEADS     # OCAB: full pack
    assert best_group(1, 64, N, N) == 1              # nothing to pack


def _swin_args(dtype):
    return dict(
        x_w=_rng((BW, N, S_C), 0, dtype),
        ln1s=_rng((S_C,), 3, jnp.float32) + 1.0,
        ln1b=_rng((S_C,), 4, jnp.float32),
        wqkv=_rng((S_C, 3 * S_C), 5, dtype),
        bqkv=_rng((3 * S_C,), 6, jnp.float32),
        bias=_rng((S_HEADS, N, N), 7, jnp.float32),
        wproj=_rng((S_C, S_C), 8, dtype),
        bproj=_rng((S_C,), 9, jnp.float32),
        ln2s=_rng((S_C,), 10, jnp.float32) + 1.0,
        ln2b=_rng((S_C,), 11, jnp.float32),
        w1=_rng((S_C, S_HIDDEN), 12, dtype),
        b1=_rng((S_HIDDEN,), 13, jnp.float32),
        w2=_rng((S_HIDDEN, S_C), 14, dtype),
        b2=_rng((S_C,), 15, jnp.float32),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_swin_forward_packed_equiv(dtype):
    args = _swin_args(dtype)
    fwd = functools.partial(
        fused_swin_block, num_heads=S_HEADS, scale=S_SCALE, block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        out0 = fwd(*args.values(), packed=False)
        out1 = fwd(*args.values(), packed=True)
    _assert_close(out1, out0, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_swin_fwd_h_packed_equiv(dtype):
    args = _swin_args(dtype)
    fwd = functools.partial(
        fused_swin_block_fwd_h, num_heads=S_HEADS, scale=S_SCALE,
        block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        out0, h0 = fwd(*args.values(), packed=False)
        out1, h1 = fwd(*args.values(), packed=True)
    _assert_close(out1, out0, dtype)
    _assert_close(h1, h0, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_swin_backward_packed_equiv(dtype):
    a = _swin_args(dtype)
    dh = _rng((BW, N, S_C), 20, dtype)
    bwd = functools.partial(
        _bwd_attn, num_heads=S_HEADS, scale=S_SCALE, block_windows=2,
    )
    with pltpu.force_tpu_interpret_mode():
        r0 = bwd(a["x_w"], dh, a["ln1s"], a["ln1b"], a["wqkv"], a["bqkv"],
                 a["bias"], a["wproj"], packed=False)
        r1 = bwd(a["x_w"], dh, a["ln1s"], a["ln1b"], a["wqkv"], a["bqkv"],
                 a["bias"], a["wproj"], packed=True)
    for g0, g1 in zip(r0, r1):
        _assert_close(g1, g0, dtype)
