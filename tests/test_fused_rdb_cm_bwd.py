"""Gradient parity: channels-major fused dense-block VJP vs XLA autodiff.

Reference semantics: hybridmodels_hat.py:21-58 (ResidualDenseBlock).
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.kernels.fused_rdb_cm_bwd import (
    make_rdb_cm_ad,
    pack_weights,
    unpack_weight_grads,
)

pytestmark = pytest.mark.slow

F, G, H, W = 16, 8, 8, 128


def _naive_rdb(xf, kernels, biases):
    """Reference dense block on (B, F, H*W) channels-major input."""
    b, f, _ = xf.shape
    x = xf.reshape(b, f, H, W).transpose(0, 2, 3, 1)

    def conv(v, k, bias):
        return (
            jax.lax.conv_general_dilated(
                v, k, (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bias
        )

    def lrelu(v):
        return jnp.where(v >= 0, v, v * 0.2)

    x1 = lrelu(conv(x, kernels[0], biases[0]))
    x2 = lrelu(conv(jnp.concatenate([x, x1], -1), kernels[1], biases[1]))
    x3 = lrelu(conv(jnp.concatenate([x, x1, x2], -1), kernels[2], biases[2]))
    x4 = lrelu(conv(jnp.concatenate([x, x1, x2, x3], -1), kernels[3], biases[3]))
    x5 = conv(jnp.concatenate([x, x1, x2, x3, x4], -1), kernels[4], biases[4])
    out = x5 * 0.2 + x
    return out.transpose(0, 3, 1, 2).reshape(b, f, H * W)


def _random_block(seed=0):
    rng = np.random.default_rng(seed)
    xf = jnp.asarray(rng.standard_normal((2, F, H * W)), jnp.float32)
    sizes = [F, F + G, F + 2 * G, F + 3 * G, F + 4 * G]
    outs = [G, G, G, G, F]
    ks = [
        jnp.asarray(rng.standard_normal((3, 3, si, so)) * 0.1, jnp.float32)
        for si, so in zip(sizes, outs)
    ]
    bs = [jnp.asarray(rng.standard_normal((so,)) * 0.1, jnp.float32) for so in outs]
    return xf, ks, bs


def test_pack_roundtrip():
    _, ks, _ = _random_block()
    packs = pack_weights(ks, jnp.float32)
    back = unpack_weight_grads(packs, F, G)
    for a, b in zip(ks, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_rdb_cm_vjp_matches_xla_fp32():
    xf, ks, bs = _random_block()
    dy = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, F, H * W)), jnp.float32
    )

    def ref_fn(xf_, ks_, bs_):
        return _naive_rdb(xf_, list(ks_), list(bs_))

    ref_out, ref_vjp = jax.vjp(ref_fn, xf, tuple(ks), tuple(bs))
    rdx, rdks, rdbs = ref_vjp(dy)

    ad = make_rdb_cm_ad(H, W, tile_h=8, bwd_tile_h=8, interpret=True)
    got_out, got_vjp = jax.vjp(ad, xf, tuple(ks), tuple(bs))
    gdx, gdks, gdbs = got_vjp(dy)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gdx), np.asarray(rdx), atol=2e-3, rtol=2e-3)
    for a, b in zip(gdks, rdks):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
    for a, b in zip(gdbs, rdbs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_fused_rdb_cm_vjp_multitile():
    """h split over 2 tiles: halo/accumulation across the grid."""
    rng = np.random.default_rng(5)
    h = 16
    xf = jnp.asarray(rng.standard_normal((1, F, h * W)), jnp.float32)
    sizes = [F, F + G, F + 2 * G, F + 3 * G, F + 4 * G]
    outs = [G, G, G, G, F]
    ks = [
        jnp.asarray(rng.standard_normal((3, 3, si, so)) * 0.1, jnp.float32)
        for si, so in zip(sizes, outs)
    ]
    bs = [jnp.asarray(rng.standard_normal((so,)) * 0.1, jnp.float32) for so in outs]
    dy = jnp.asarray(rng.standard_normal((1, F, h * W)), jnp.float32)

    def ref_fn(xf_, ks_, bs_):
        b = xf_.shape[0]
        x = xf_.reshape(b, F, h, W).transpose(0, 2, 3, 1)

        def conv(v, k, bias):
            return (
                jax.lax.conv_general_dilated(
                    v, k, (1, 1), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                + bias
            )

        def lrelu(v):
            return jnp.where(v >= 0, v, v * 0.2)

        x1 = lrelu(conv(x, ks_[0], bs_[0]))
        x2 = lrelu(conv(jnp.concatenate([x, x1], -1), ks_[1], bs_[1]))
        x3 = lrelu(conv(jnp.concatenate([x, x1, x2], -1), ks_[2], bs_[2]))
        x4 = lrelu(conv(jnp.concatenate([x, x1, x2, x3], -1), ks_[3], bs_[3]))
        x5 = conv(jnp.concatenate([x, x1, x2, x3, x4], -1), ks_[4], bs_[4])
        return (x5 * 0.2 + x).transpose(0, 3, 1, 2).reshape(b, F, h * W)

    ref_out, ref_vjp = jax.vjp(ref_fn, xf, tuple(ks), tuple(bs))
    rdx, rdks, rdbs = ref_vjp(dy)

    ad = make_rdb_cm_ad(h, W, tile_h=8, bwd_tile_h=8, interpret=True)
    got_out, got_vjp = jax.vjp(ad, xf, tuple(ks), tuple(bs))
    gdx, gdks, gdbs = got_vjp(dy)

    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gdx), np.asarray(rdx), atol=2e-3, rtol=2e-3)
    for a, b in zip(gdks, rdks):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
    for a, b in zip(gdbs, rdbs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)
