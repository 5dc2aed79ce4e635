"""Interpret-mode parity for the channels-major fused dense-block kernel.

fused_rdb_cm must reproduce the reference concat formulation
(hybridmodels_hat.py:21-44) exactly, including the zero-padding semantics
its lane rotations + row masks re-create at tile boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from superresolution_def_tpu.kernels.fused_rdb_cm import fused_rdb_cm, fused_rrdb_trunk_cm
from tests.test_fused_rdb import _ref_rdb, _weights

pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'


def _run_cm(x, ks, bs, tile_h):
    b, h, w, f = x.shape
    xf = x.transpose(0, 3, 1, 2).reshape(b, f, h * w)
    out = fused_rdb_cm(xf, ks, bs, h=h, w=w, tile_h=tile_h, interpret=True)
    return out.reshape(b, f, h, w).transpose(0, 2, 3, 1)


@pytest.mark.parametrize("tile_h", [16, 32, 64])
def test_fused_rdb_cm_matches_reference(tile_h):
    rng = np.random.default_rng(0)
    f, g = 48, 24
    x = jnp.asarray(rng.standard_normal((2, 64, 128, f), np.float32) * 0.1)
    ks, bs = _weights(rng, f, g)
    ref = _ref_rdb(x, ks, bs)
    got = _run_cm(x, ks, bs, tile_h)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fused_rdb_cm_uneven_last_tile():
    """h not a multiple of the target tile: _pick_tile falls back to a divisor."""
    rng = np.random.default_rng(3)
    f, g = 16, 8
    x = jnp.asarray(rng.standard_normal((1, 24, 128, f), np.float32) * 0.1)
    ks, bs = _weights(rng, f, g)
    ref = _ref_rdb(x, ks, bs)
    got = _run_cm(x, ks, bs, tile_h=16)  # picks 12
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fused_rrdb_trunk_cm_matches_model():
    """Whole trunk through the cm kernel == the model's packed XLA trunk."""
    from superresolution_def_tpu.models.hybrid import RRDBBlock

    rng = np.random.default_rng(2)
    f, g = 16, 8
    x = jnp.asarray(rng.standard_normal((1, 32, 128, f), np.float32) * 0.1)
    m = RRDBBlock(num_feat=f, num_grow_ch=g)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = m.apply({"params": p}, x)
    params = {"rrdb_trunk_0": p}
    got = fused_rrdb_trunk_cm(params, x, 1, tile_h=32, interpret=True)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4
