"""Spatially-sharded SwinIR vs the dense model — exact halo semantics."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.models import SwinIR
from superresolution_def_tpu.parallel import make_mesh
from superresolution_def_tpu.parallel.spatial import (
    make_spatial_swinir,
    _roll_up,
    _roll_down,
    _halo_conv3,
)
from jax import shard_map
from jax.sharding import PartitionSpec as P



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_roll_halo_matches_global_roll():
    mesh = make_mesh()
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 8, 3), np.float32))

    def up(xl):
        return _roll_up(xl, 4, "data", 8)

    f = shard_map(up, mesh=mesh, in_specs=P(None, "data", None, None),
                  out_specs=P(None, "data", None, None))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(jnp.roll(x, -4, axis=1)), atol=1e-7
    )

    def down(xl):
        return _roll_down(xl, 4, "data", 8)

    g = shard_map(down, mesh=mesh, in_specs=P(None, "data", None, None),
                  out_specs=P(None, "data", None, None))
    np.testing.assert_allclose(
        np.asarray(g(x)), np.asarray(jnp.roll(x, 4, axis=1)), atol=1e-7
    )


def test_halo_conv_matches_dense_conv():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 64, 16, 3), np.float32))
    k = jnp.asarray(rng.random((3, 3, 3, 5), np.float32))
    b = jnp.asarray(rng.random((5,), np.float32))

    def conv(xl):
        return _halo_conv3(xl, k, b, "data", 8)

    f = shard_map(conv, mesh=mesh, in_specs=P(None, "data", None, None),
                  out_specs=P(None, "data", None, None))
    ref = (
        jax.lax.conv_general_dilated(
            x, k, (1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    np.testing.assert_allclose(np.asarray(f(x)), np.asarray(ref), atol=1e-5)


def test_spatial_swinir_matches_dense():
    mesh = make_mesh()
    model = SwinIR(
        img_size=64, in_chans=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=8, mlp_ratio=2.0, upscale=4,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 16, 1)))["params"]
    x = jnp.asarray(np.random.default_rng(2).random((2, 64, 16, 1), np.float32))

    dense = model.apply({"params": params}, x)
    fn = make_spatial_swinir(
        mesh, depths=(2,), num_heads=(2,), window_size=8, upscale=4
    )
    sharded = fn(params, x)
    assert sharded.shape == (2, 256, 64, 1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=2e-5, rtol=1e-4
    )
