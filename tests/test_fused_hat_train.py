"""Gradient parity for the fused-trunk hybrid training path.

create_hat_train_state(fused=True) must produce the same generator outputs
and gradients as the flax model (trunk routed through the channels-major
pallas custom-VJP kernels, interpret mode on CPU).
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.train import create_hat_train_state

pytestmark = pytest.mark.slow

CFG = dict(
    img_size=64, embed_dim=30, depths=(2,), num_heads=(6,), window_size=8,
    num_rrdb=1, num_feat=16, num_grow_ch=8,
)


def test_fused_trunk_hybrid_grads_match_flax():
    s0, b0 = create_hat_train_state(jax.random.PRNGKey(0), **CFG)
    s1, b1 = create_hat_train_state(
        jax.random.PRNGKey(0), **CFG, fused=True, fused_hab=True, fused_interpret=True
    )
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 1), np.float32))

    leaves0 = jax.tree_util.tree_leaves(s0.g_params)
    leaves1 = jax.tree_util.tree_leaves(s1.g_params)
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out0 = b0.g_apply({"params": s0.g_params}, x, True)
    with pltpu.force_tpu_interpret_mode():
        out1 = b1.g_apply({"params": s1.g_params}, x, True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=5e-5, rtol=2e-4)

    tgt = out0 + 0.1

    def loss0(p):
        return jnp.mean(jnp.abs(b0.g_apply({"params": p}, x, True) - tgt))

    def loss1(p):
        return jnp.mean(jnp.abs(b1.g_apply({"params": p}, x, True) - tgt))

    g0 = jax.grad(loss0)(s0.g_params)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss1)(s1.g_params)
    flat0, _ = jax.flatten_util.ravel_pytree(g0)
    flat1, _ = jax.flatten_util.ravel_pytree(g1)
    np.testing.assert_allclose(
        np.asarray(flat1), np.asarray(flat0), atol=2e-4, rtol=2e-3
    )


def test_default_fused_path_flax_backbone_outputs_match():
    """fused=True default (flax HAT backbone + fused trunk) output parity."""
    s0, b0 = create_hat_train_state(jax.random.PRNGKey(0), **CFG)
    s1, b1 = create_hat_train_state(
        jax.random.PRNGKey(0), **CFG, fused=True, fused_interpret=True
    )
    x = jnp.asarray(np.random.default_rng(2).random((1, 64, 64, 1), np.float32))
    out0 = b0.g_apply({"params": s0.g_params}, x, True)
    with pltpu.force_tpu_interpret_mode():
        out1 = b1.g_apply({"params": s1.g_params}, x, True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=5e-5, rtol=2e-4)


def test_fused_hab_droppath_shapes_and_mean():
    """Non-deterministic path: drop-path masks applied per sample; output
    stays finite and differs from the deterministic one."""
    s1, b1 = create_hat_train_state(
        jax.random.PRNGKey(0), **CFG, fused=True, fused_hab=True, fused_interpret=True
    )
    x = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 1), np.float32))
    with pltpu.force_tpu_interpret_mode():
        det = b1.g_apply({"params": s1.g_params}, x, True)
        sto = b1.g_apply(
            {"params": s1.g_params}, x, False,
            rngs={"droppath": jax.random.PRNGKey(7)},
        )
    assert np.isfinite(np.asarray(sto)).all()
    assert det.shape == sto.shape
