"""Interpret-mode parity for the fused ResidualDenseBlock kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_def_tpu.kernels.fused_rdb import fused_rdb

pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'


def _ref_rdb(x, ks, bs):
    """Reference concat formulation (hybridmodels_hat.py:21-44)."""

    def conv(v, k, b):
        return (
            jax.lax.conv_general_dilated(
                v, k, (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )

    def lrelu(v):
        return jnp.where(v >= 0, v, v * 0.2)

    x1 = lrelu(conv(x, ks[0], bs[0]))
    x2 = lrelu(conv(jnp.concatenate([x, x1], -1), ks[1], bs[1]))
    x3 = lrelu(conv(jnp.concatenate([x, x1, x2], -1), ks[2], bs[2]))
    x4 = lrelu(conv(jnp.concatenate([x, x1, x2, x3], -1), ks[3], bs[3]))
    x5 = conv(jnp.concatenate([x, x1, x2, x3, x4], -1), ks[4], bs[4])
    return x5 * 0.2 + x


def _weights(rng, f, g):
    ks, bs = [], []
    for cin, cout in [(f, g), (f + g, g), (f + 2 * g, g), (f + 3 * g, g), (f + 4 * g, f)]:
        ks.append(
            jnp.asarray(rng.standard_normal((3, 3, cin, cout), np.float32) * (2.0 / (9 * cin)) ** 0.5)
        )
        bs.append(jnp.asarray(rng.standard_normal((cout,), np.float32) * 0.01))
    return ks, bs


@pytest.mark.parametrize("tile", [(32, 32), (64, 16), (64, 32)])
def test_fused_rdb_matches_reference(tile):
    rng = np.random.default_rng(0)
    f, g = 48, 24
    x = jnp.asarray(rng.standard_normal((2, 64, 64, f), np.float32) * 0.1)
    ks, bs = _weights(rng, f, g)
    ref = _ref_rdb(x, ks, bs)
    got = fused_rdb(x, ks, bs, tile_h=tile[0], tile_w=tile[1], interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fused_rdb_tap_matmul_variant():
    rng = np.random.default_rng(1)
    f, g = 48, 24
    x = jnp.asarray(rng.standard_normal((1, 32, 32, f), np.float32) * 0.1)
    ks, bs = _weights(rng, f, g)
    ref = _ref_rdb(x, ks, bs)
    got = fused_rdb(x, ks, bs, tile_h=32, tile_w=32, tap_matmul=True, interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fused_rrdb_trunk_matches_model():
    """Whole trunk through the kernel == the model's packed XLA trunk."""
    from superresolution_def_tpu.kernels.fused_rdb import fused_rrdb_trunk
    from superresolution_def_tpu.models.hybrid import RRDBBlock

    rng = np.random.default_rng(2)
    f, g = 16, 8
    x = jnp.asarray(rng.standard_normal((1, 32, 32, f), np.float32) * 0.1)
    m = RRDBBlock(num_feat=f, num_grow_ch=g)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = m.apply({"params": p}, x)
    params = {"rrdb_trunk_0": p}
    got = fused_rrdb_trunk(params, x, 1, tile_h=32, tile_w=32, interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4
