"""Pallas window-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.kernels import window_attention


def _qkv(bw=16, h=2, n=64, d=32, m=None, seed=0):
    rng = np.random.default_rng(seed)
    m = m or n
    q = rng.standard_normal((bw, h, n, d)).astype(np.float32)
    k = rng.standard_normal((bw, h, m, d)).astype(np.float32)
    v = rng.standard_normal((bw, h, m, d)).astype(np.float32)
    bias = rng.standard_normal((h, n, m)).astype(np.float32) * 0.1
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bias)


def test_pallas_matches_xla_no_mask():
    q, k, v, bias = _qkv()
    scale = 32**-0.5
    ref = window_attention(q, k, v, bias, None, scale=scale, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = window_attention(q, k, v, bias, None, scale=scale, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_matches_xla_with_shift_mask():
    q, k, v, bias = _qkv(bw=8, seed=1)
    from superresolution_def_tpu.ops import shift_window_attn_mask

    mask = jnp.asarray(shift_window_attn_mask(16, 16, 8, 4))  # (nW=4, 64, 64)
    scale = 32**-0.5
    ref = window_attention(q, k, v, bias, mask, scale=scale, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = window_attention(q, k, v, bias, mask, scale=scale, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_rectangular_kv_ocab_shape():
    """OCAB: 64 queries x 144 keys per window."""
    q, k, v, bias = _qkv(bw=8, n=64, m=144, seed=2)
    scale = 32**-0.5
    ref = window_attention(q, k, v, bias, None, scale=scale, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        got = window_attention(q, k, v, bias, None, scale=scale, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_flow_through_xla_impl():
    q, k, v, bias = _qkv(bw=4)
    scale = 32**-0.5

    def loss(q):
        return jnp.sum(window_attention(q, k, v, bias, None, scale=scale, impl="xla") ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
