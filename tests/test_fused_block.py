"""Fused whole-block kernel vs the unfused flax SwinIR (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.models import SwinIR
from superresolution_def_tpu.kernels.swin_block import make_fused_swinir



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_fused_forward_matches_flax_fp32():
    model = SwinIR(
        img_size=16, in_chans=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=8, mlp_ratio=2.0, upscale=4,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    fn = make_fused_swinir(
        depths=(2,), num_heads=(2,), window_size=8, upscale=4,
        dtype=jnp.float32, block_windows=4,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_fused_forward_bf16_close():
    model = SwinIR(
        img_size=16, in_chans=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=8, mlp_ratio=2.0, upscale=4,
    )
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)

    fn = make_fused_swinir(
        depths=(2,), num_heads=(2,), window_size=8, upscale=4,
        dtype=jnp.bfloat16, block_windows=4,
    )
    with pltpu.force_tpu_interpret_mode():
        got = fn(params, x).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2, rtol=5e-2)
