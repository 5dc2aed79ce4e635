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


def test_ocab_train_grads_match_xla():
    """kernels/ocab_train.ocab_train vs the XLA _ocab: forward and full
    gradient parity (x and every OCAB param, incl. the rel-pos bias table)
    in fp32 interpret mode."""
    from superresolution_def_tpu.models.hat import OCAB
    from superresolution_def_tpu.kernels.fused_hat import _ocab
    from superresolution_def_tpu.kernels.ocab_train import ocab_train

    dim, ws, heads = 30, 8, 6
    h = w = 16
    mod = OCAB(dim=dim, window_size=ws, overlap_ratio=0.5, num_heads=heads)
    x0 = jnp.asarray(np.random.default_rng(0).random((1, h * w, dim), np.float32))
    params = mod.init(jax.random.PRNGKey(0), x0, (h, w))["params"]
    x = x0.reshape(1, h, w, dim)

    out0 = _ocab(params, x, ws, 0.5, heads)
    with pltpu.force_tpu_interpret_mode():
        out1 = ocab_train(params, x, ws, 0.5, heads)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5, rtol=1e-4)

    tgt = out0 + 0.05

    def loss(fn):
        def f(p, xin):
            return jnp.mean(jnp.abs(fn(p, xin, ws, 0.5, heads) - tgt))

        return f

    g0p, g0x = jax.grad(loss(_ocab), argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        g1p, g1x = jax.grad(loss(ocab_train), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g0x), atol=1e-5, rtol=1e-4)
    f0, _ = jax.flatten_util.ravel_pytree(g0p)
    f1, _ = jax.flatten_util.ravel_pytree(g1p)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-5, rtol=2e-4)


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
