"""Rematerialization: identical outputs and gradients, less live memory."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.models import SwinIR, HybridHATRealESRGAN



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_swinir_remat_outputs_and_grads_match():
    kwargs = dict(
        img_size=16, in_chans=1, embed_dim=16, depths=(2,), num_heads=(2,),
        window_size=8, mlp_ratio=2.0, upscale=4,
    )
    base = SwinIR(**kwargs)
    rm = SwinIR(**kwargs, remat=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, 16, 16, 1), np.float32))
    params = base.init(jax.random.PRNGKey(0), x)["params"]

    out_a = base.apply({"params": params}, x)
    out_b = rm.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    ga = jax.grad(lambda p: jnp.sum(base.apply({"params": p}, x) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(rm.apply({"params": p}, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_hybrid_remat_matches():
    kwargs = dict(
        img_size=16, in_chans=1, embed_dim=16, depths=(1,), num_heads=(2,),
        window_size=8, num_rrdb=1, num_feat=16, num_grow_ch=8,
    )
    base = HybridHATRealESRGAN(**kwargs)
    rm = HybridHATRealESRGAN(**kwargs, remat=True)
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 1), np.float32))
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_a = base.apply({"params": params}, x, True)
    out_b = rm.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
