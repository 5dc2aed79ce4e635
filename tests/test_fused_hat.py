"""Fused-HAB hybrid forward vs the flax model (interpret mode)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.models import HybridHATRealESRGAN
from superresolution_def_tpu.models.hat import HAT
from superresolution_def_tpu.kernels.fused_hat import make_fused_hat, make_fused_hybrid



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_fused_hybrid_matches_flax_fp32():
    model = HybridHATRealESRGAN(
        img_size=16, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=4, num_rrdb=1, num_feat=16, num_grow_ch=8,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x, True)

    fn = make_fused_hybrid(
        depths=(2,), num_heads=(6,), window_size=8, num_rrdb=1,
        dtype=jnp.float32, block_windows=4,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=2e-4)


def test_fused_ocab_matches_xla_fp32():
    """kernels/ocab.py fused tail vs the all-XLA _ocab, same params."""
    from superresolution_def_tpu.kernels.fused_hat import _ocab, _ocab_fused
    from superresolution_def_tpu.models.hat import HAT

    model = HAT(
        img_size=16, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=2, upsampler="pixelshuffle", img_range=1.0,
    )
    xin = jnp.asarray(np.random.default_rng(3).random((1, 16, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), xin)["params"]
    p = params["layers_0"]["overlap_attn"]
    x = jnp.asarray(np.random.default_rng(4).random((2, 16, 16, 30), np.float32))

    ref = _ocab(p, x, 8, 0.5, 6)
    with pltpu.force_tpu_interpret_mode():
        got = _ocab_fused(p, x, 8, 0.5, 6, block_windows=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=2e-4)


def test_fused_standalone_hat_matches_flax_fp32():
    """make_fused_hat (HAT without the hybrid head) vs the flax HAT."""
    model = HAT(
        img_size=16, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=2, upsampler="pixelshuffle", img_range=1.0,
    )
    x = jnp.asarray(np.random.default_rng(2).random((2, 16, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x, True)

    fwd = make_fused_hat(
        depths=(2,), num_heads=(6,), window_size=8,
        dtype=jnp.float32, block_windows=4,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fwd(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=2e-4)


def test_fused_hybrid_cm_trunk_matches_flax_fp32():
    """Wide enough input (trunk W=128) to route through the channels-major
    fused dense-block kernel instead of the packed-XLA fallback."""
    model = HybridHATRealESRGAN(
        img_size=64, in_chans=1, embed_dim=30, depths=(2,), num_heads=(6,),
        window_size=8, upscale=4, num_rrdb=1, num_feat=16, num_grow_ch=8,
    )
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 64, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x, True)

    fn = make_fused_hybrid(
        depths=(2,), num_heads=(6,), window_size=8, num_rrdb=1,
        dtype=jnp.float32, block_windows=4,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=2e-4)
