"""Spatially-sharded HAT / Hybrid vs dense models — exact halo semantics."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.models import HAT, HybridHATRealESRGAN
from superresolution_def_tpu.parallel import make_mesh
from superresolution_def_tpu.parallel.spatial_hat import (
    make_spatial_hat,
    make_spatial_hybrid,
)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_spatial_hat_matches_dense():
    mesh = make_mesh()
    model = HAT(
        img_size=64, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=2, upsampler="pixelshuffle", img_range=1.0,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    dense = model.apply({"params": params}, x, True)

    fn = make_spatial_hat(
        mesh, depths=(2,), num_heads=(6,), window_size=8, upscale=2
    )
    sharded = fn(params, x)
    assert sharded.shape == (2, 128, 32, 1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=3e-5, rtol=1e-4
    )


def test_spatial_hybrid_matches_dense():
    mesh = make_mesh()
    model = HybridHATRealESRGAN(
        img_size=64, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=4, num_rrdb=2, num_feat=16, num_grow_ch=8,
    )
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    dense = model.apply({"params": params}, x, True)

    fn = make_spatial_hybrid(
        mesh, depths=(2,), num_heads=(6,), window_size=8, num_rrdb=2
    )
    sharded = fn(params, x)
    assert sharded.shape == (1, 256, 64, 1)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(dense), atol=5e-5, rtol=1e-4
    )
